#!/usr/bin/env python3
"""Adversarial-instance generator for the differential fuzz harness.

The driver regenerates /root/testdata each round; queries must be
instance-proof, not instance-lucky (t25/q50 lesson, rounds 4-5).
This writes fuzz variants of the `documents` table that exercise the
cross-engine (Java-regex/UTF-16 Spark vs RE2/UTF-8 DuckDB) edges:

  - unicode whitespace: NBSP, figure space, line/para separator,
    zero-width space, vertical tab \\x0b, form feed, CR, CRLF, tabs
  - unicode case chars: Turkish I/i, sharp s, final sigma, fullwidth,
    non-BMP (surrogate pairs in UTF-16), combining marks
  - empty / whitespace-only / 1-token / huge docs
  - duplicate doc_id within source (incl. fully identical rows)
  - n_chars inconsistent with len(text)
  - drifted physical parquet types (doc_id int32, n_chars double)

Usage: python3 tools/fuzzgen.py /tmp/fuzz
Creates <out>/content/ and <out>/typedrift/ dirs, each a full table set
(non-documents tables hard-linked from /root/testdata/sf0.001).
"""
import os, random, shutil, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]

WORDS = ("the quick brown fox jumps over lazy dog data spark engine "
         "query token corpus model train shard merge scan filter "
         "alpha beta gamma delta epsilon zeta eta theta").split()

UNI_WS = [" ", " ", " ", " ", "​", "\x0b",
          "\x0c", "\r", "\r\n", "\t", "\t\t", " \x0b ", "　"]
UNI_CASE = ["İstanbul", "ıssız", "STRASSE", "straße", "ΣΟΦΟΣ", "σοφος",
            "ὈΔΥΣΣΕΎΣ", "ﬁle", "Ｆｕｌｌ", "ｗｉｄｔｈ", "𝕏ray", "𝐁old",
            "naïve", "café", "CAFÉ", "ҐаЗда", "ЩУКА", "ĳsberg", "Ǆevad"]


def sentence(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def make_docs(rng):
    rows = []  # (doc_id, text, lang, source, n_chars)
    doc_id = 0
    langs = ["en", "de", "fr"]
    sources = ["web", "books", "code", "wiki", "news"]

    def add(text, did=None, nchars=None, lang=None, source=None):
        nonlocal doc_id
        i = doc_id if did is None else did
        rows.append((i, text,
                     lang or langs[i % 3], source or sources[i % 5],
                     len(text) if nchars is None and text is not None else nchars))
        if did is None:
            doc_id += 1

    # plain docs so frequency thresholds still trigger
    for _ in range(120):
        add(sentence(rng, rng.randint(5, 40)))
    # unicode whitespace woven between ordinary tokens
    for k in range(60):
        ws = UNI_WS[k % len(UNI_WS)]
        parts = [rng.choice(WORDS) for _ in range(rng.randint(2, 12))]
        add(ws.join(parts) + rng.choice(["", ws, " ", "\n"]))
    # unicode case / non-BMP tokens mixed into ASCII sentences
    for k in range(60):
        toks = [rng.choice(WORDS) for _ in range(rng.randint(2, 10))]
        toks.insert(rng.randrange(len(toks)), UNI_CASE[k % len(UNI_CASE)])
        add(" ".join(toks))
    # degenerate sizes
    add("")
    add(" ")
    add("   \t\n  ")
    add("  ")
    add("x")
    add("word")
    add("  edgecase  ")
    add("UPPER ONLY DOC")
    add("MiXeD CaSe DoC with The and Of")
    add(sentence(rng, 2500))                     # huge
    add("bullet\n- one\n- two\n* three\n• four\nend...")
    add("dots...\nellipsis…\ncrlf...\r\nplain")
    add("email a@b.co ip 1.2.3.4 num 12345")
    # duplicate doc_id rows. doc_id is the table key in every driver
    # instance, so dup ids only need to be survivable when the rows
    # are row-level duplicates (identical, or differing in a column a
    # query orders by) — dup ids with DIFFERENT text would make
    # per-row semantics unreplayable in doc_id-keyed oracle SQL.
    dup = sentence(rng, 6)
    add(dup, did=9011, source=sources[1], nchars=len(dup))
    add(dup, did=9011, source=sources[1], nchars=len(dup))
    # same id + text, different n_chars: exercises q50's window-order
    # ambiguity (the prefix-sum tie) without breaking text queries.
    dup2 = sentence(rng, 7)
    add(dup2, did=9013, source=sources[3], nchars=150)
    add(dup2, did=9013, source=sources[3], nchars=350)
    # n_chars lies about the text length
    add(sentence(rng, 10), nchars=3)
    add(sentence(rng, 10), nchars=999999)
    # exact duplicate text under different ids (dedup food)
    base = sentence(rng, 15)
    for _ in range(6):
        add(base)
    # near-duplicates for jaccard/minhash paths
    for _ in range(20):
        toks = base.split()
        i = rng.randrange(len(toks))
        toks[i] = rng.choice(WORDS)
        add(" ".join(toks))
    rng.shuffle(rows)
    return rows


def make_hot_docs(rng):
    """Hot-bucket adversarial corpus: enough near-identical docs that
    the quadratic-guard caps actually FIRE (on clean corpora they are
    dead code in every sweep):

      - a 660-doc cluster sharing ONE token set (order/repeat
        variations): identical minhash signature in EVERY band, so
        each (band, bucket) holds all 660 docs -> d03's bucket cap
        (660 > 500) and d27's index-side cap (~528 index docs > 500)
        fire, and the oracles' HAVING <= 500 must mirror the drop;
      - a 30-doc identical-set cluster BELOW the cap whose pairs must
        all survive (the cap drops hot buckets only);
      - 40 docs sharing a boilerplate prefix with unique tails
        (hot shared grams: d26 containment / d11 / d16 food).
    """
    rows = []
    doc_id = 0
    langs = ["en", "de", "fr"]
    sources = ["web", "books", "code", "wiki", "news"]

    def add(text):
        nonlocal doc_id
        rows.append((doc_id, text, langs[doc_id % 3],
                     sources[doc_id % 5], len(text)))
        doc_id += 1

    # background docs so corpus-level stats are not degenerate
    for _ in range(80):
        add(sentence(rng, rng.randint(5, 30)))
    core = ["boiler", "plate", "nav", "footer",
            "cookie", "accept", "privacy", "terms"]
    for j in range(660):
        toks = core[:]
        rng.shuffle(toks)
        toks += [rng.choice(core) for _ in range(rng.randint(0, 6))]
        # second line: a verbatim banner on most docs — ONE hot line
        # repeated across hundreds of documents, the d28 line-dedup
        # skew case (the first-occurrence aggregate must reduce it
        # map-side, and only its first (doc, position) survives).
        banner = "" if j % 10 == 0 else "\nthis site uses cookies accept to continue"
        add(" ".join(toks) + banner)
    core2 = ["qoph", "resh", "shin"]
    for _ in range(30):
        t = core2[:]
        rng.shuffle(t)
        add(" ".join(t))
    boiler = sentence(rng, 12)
    for _ in range(40):
        add(boiler + " " + sentence(rng, rng.randint(3, 8)))
    rng.shuffle(rows)
    return rows


def write_variant(out_dir, rows, id_type, nchars_type):
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            try:
                os.link(f"{SRC_SF}/{t}.parquet", dst)
            except OSError:
                shutil.copy(f"{SRC_SF}/{t}.parquet", dst)
    cols = list(zip(*rows))
    tbl = pa.table({
        "doc_id": pa.array(cols[0], type=id_type),
        "text": pa.array(cols[1], type=pa.string()),
        "lang": pa.array(cols[2], type=pa.string()),
        "source": pa.array(cols[3], type=pa.string()),
        "n_chars": pa.array(cols[4], type=nchars_type),
    })
    pq.write_table(tbl, f"{out_dir}/documents.parquet")
    print(f"wrote {out_dir}/documents.parquet rows={len(rows)}")


ALL_TABLES = TABLES + ["documents"]


def _dup_rows(tbl, idx):
    """Append exact copies of the rows at `idx` (row-level duplicates —
    the only dup shape a keyed generator can emit)."""
    import pyarrow.compute as pc
    picked = tbl.take(pa.array(idx, type=pa.int64()))
    return pa.concat_tables([tbl, picked])


def make_rel_content():
    """Adversarial content for the relational/events side: row-level
    duplicates in every fact table, plus lineitem rows that tie on
    q08's full window-order key with a DIFFERENT l_quantity (the one
    residual cum-sum ambiguity class), plus events rows tying on
    (user_id, ts), plus null/empty props.
    Returns {table: pa.Table}."""
    import pyarrow.compute as pc
    out = {}
    for t in ALL_TABLES:
        tbl = pa.parquet.read_table(f"{SRC_SF}/{t}.parquet")
        if t in ("orders", "lineitem", "events", "documents"):
            n = tbl.num_rows
            tbl = _dup_rows(tbl, [0, 1, 2, n // 2, n - 1])
        out[t] = tbl

    li = out["lineitem"]
    # two rows equal in (suppkey, shipdate, orderkey, linenumber,
    # partkey, extendedprice) but different quantity → only a window
    # order that includes l_quantity stays engine-deterministic
    base = li.slice(0, 1).to_pylist()[0]
    r1 = dict(base); r1["l_quantity"] = 7.0
    r2 = dict(base); r2["l_quantity"] = 29.0
    extra = pa.Table.from_pylist([r1, r2], schema=li.schema)
    out["lineitem"] = pa.concat_tables([li, extra])

    ev = out["events"]
    base = ev.slice(0, 1).to_pylist()[0]
    # same (user_id, ts), distinct event_id → session/asof order ties
    r1 = dict(base); r1["event_id"] = 10**9 + 1; r1["event_type"] = "view"
    r2 = dict(base); r2["event_id"] = 10**9 + 2; r2["event_type"] = "click"
    # null + empty props
    r3 = dict(base); r3["event_id"] = 10**9 + 3; r3["props"] = None
    r4 = dict(base); r4["event_id"] = 10**9 + 4; r4["props"] = "{}"
    r5 = dict(base); r5["event_id"] = 10**9 + 5; r5["value"] = 0.0
    extra = pa.Table.from_pylist([r1, r2, r3, r4, r5], schema=ev.schema)
    out["events"] = pa.concat_tables([ev, extra])
    return out


def make_rel_clicksonly(tables):
    """One-sided event stream: every purchase row removed. A side with
    no rows never advances its stream watermark, so st13's left-outer
    closed region must collapse to EMPTY on both engines — the
    least()-skips-NULLs trap (least(max_tc, NULL) = max_tc would claim
    a non-empty region the streaming engine never flushes)."""
    import pyarrow.compute as pc
    out = dict(tables)
    ev = tables["events"]
    out["events"] = ev.filter(
        pc.not_equal(ev.column("event_type"), pa.scalar("purchase")))
    return out


def _retype(tbl, casts):
    """Cast named columns to new arrow types (values preserved)."""
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name in casts:
            col = col.cast(casts[name])
        cols[name] = col
    return pa.table(cols)


def make_rel_typedrift(tables):
    """Drift the physical parquet types the way the driver's generator
    already drifted events.ts once (nanos → NTZ): integer keys narrow
    to int32, dates move between timestamp[us] and date32, floats
    narrow to float32, int-valued doubles become int64."""
    import pyarrow.compute as pc
    out = dict(tables)
    out["orders"] = _retype(tables["orders"], {
        "o_orderkey": pa.int32(), "o_custkey": pa.int32(),
        "o_orderdate": pa.date32(), "o_totalprice": pa.float64()})
    li = tables["lineitem"]
    # l_quantity is integral in every generated instance → int64 drift
    li = _retype(li, {
        "l_orderkey": pa.int32(), "l_partkey": pa.int32(),
        "l_suppkey": pa.int32(), "l_linenumber": pa.int64(),
        "l_shipdate": pa.date32(),
        "l_quantity": pa.int64()})
    out["lineitem"] = li
    out["events"] = _retype(tables["events"], {
        "event_id": pa.int32(), "user_id": pa.int32(),
        "ts": pa.timestamp("ns")})
    out["customer"] = _retype(tables["customer"], {
        "c_custkey": pa.int32(), "c_acctbal": pa.float32()})
    out["supplier"] = _retype(tables["supplier"], {
        "s_suppkey": pa.int32(), "s_acctbal": pa.float32()})
    out["part"] = _retype(tables["part"], {
        "p_partkey": pa.int32(), "p_size": pa.int64(),
        "p_retailprice": pa.float32()})
    return out


def make_embeddings():
    """Adversarial embeddings: zero vectors (cosine undefined — Spark's
    kernel yields NULL, DuckDB's list_cosine_similarity returns -1.0
    unless guarded), a zero QUERY vector (vec_id 3 drives s01/s02
    top-k), duplicate vec_ids (one exact copy, one with a DIFFERENT
    vector), constant / alternating-sign / tiny-magnitude vectors, and
    wrong-dimension + empty rows that the dim-64 quarantine must drop
    identically on both engines. Returns list-of-dict rows."""
    tbl = pq.read_table(f"{SRC_SF}/embeddings.parquet")
    rows = tbl.to_pylist()
    d = len(rows[0]["embedding"])
    mx = max(r["vec_id"] for r in rows)
    for r in rows:
        if r["vec_id"] == 3:
            r["embedding"] = [0.0] * d
    extra = [
        dict(vec_id=mx + 1, embedding=[0.0] * d, label=1),
        dict(rows[10]),
        dict(vec_id=rows[11]["vec_id"],
             embedding=[((i * 7) % 13 - 6) / 7.0 for i in range(d)],
             label=rows[11]["label"]),
        dict(vec_id=mx + 2, embedding=[0.25] * d, label=2),
        dict(vec_id=mx + 3,
             embedding=[(-1.0 if i % 2 else 1.0) for i in range(d)], label=3),
        dict(vec_id=mx + 4, embedding=[1e-20] * d, label=4),
        dict(vec_id=mx + 5, embedding=[1.0] * (d // 2), label=5),
        dict(vec_id=mx + 6, embedding=[], label=6),
    ]
    return rows + extra


def write_emb_variant(out_dir, rows, id_type, elem_type, label_type):
    os.makedirs(out_dir, exist_ok=True)
    for t in ALL_TABLES:
        if t == "embeddings":
            continue
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            try:
                os.link(f"{SRC_SF}/{t}.parquet", dst)
            except OSError:
                shutil.copy(f"{SRC_SF}/{t}.parquet", dst)
    tbl = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], type=id_type),
        "embedding": pa.array([r["embedding"] for r in rows],
                              type=pa.list_(elem_type)),
        "label": pa.array([r["label"] for r in rows], type=label_type),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet",
                   store_schema=False, version="2.6")
    print(f"wrote {out_dir}/embeddings.parquet rows={len(rows)}")


def write_tables(out_dir, tables):
    os.makedirs(out_dir, exist_ok=True)
    for t, tbl in tables.items():
        pq.write_table(tbl, f"{out_dir}/{t}.parquet",
                       store_schema=False, version="2.6")
    print(f"wrote {out_dir}: " +
          ", ".join(f"{t}={tbl.num_rows}" for t, tbl in sorted(tables.items())))


def main(out):
    rng = random.Random(20260814)
    rows = make_docs(rng)
    write_variant(f"{out}/content", rows, pa.int64(), pa.int64())
    write_variant(f"{out}/typedrift", rows, pa.int32(), pa.float64())
    write_variant(f"{out}/hotbucket", make_hot_docs(rng),
                  pa.int64(), pa.int64())
    rel = make_rel_content()
    write_tables(f"{out}/relcontent", rel)
    write_tables(f"{out}/reltypes", make_rel_typedrift(rel))
    write_tables(f"{out}/relclicks", make_rel_clicksonly(rel))
    erows = make_embeddings()
    # embcontent: canonical physical types; embtypes: int32 ids,
    # float64 elements (float values widen losslessly — the FLOAT-fold
    # normalization must make both instances byte-identical), int64
    # labels.
    write_emb_variant(f"{out}/embcontent", erows,
                      pa.int64(), pa.float32(), pa.int32())
    write_emb_variant(f"{out}/embtypes", erows,
                      pa.int32(), pa.float64(), pa.int64())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz")
