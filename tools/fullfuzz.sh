#!/bin/bash
# Complete differential fuzz battery: every query family against every
# adversarial corpus variant (see TESTDATA.md). Run fuzzgen first:
#   python3 tools/fuzzgen.py /tmp/fuzz
#   bash tools/fullfuzz.sh          # ~10 min; results to stdout
# Subset prefixes are per-family; compare.py must receive the SAME
# list as Verify (an in-subset query with no output dir is a FAIL).
set -e
cd "$(dirname "$0")/.."
FUZZ="${1:-/tmp/fuzz}"
run() {  # dir subset tag
  SPARK_GRAFT_ONLY="$2" sbt -batch "runMain graft.Verify $1 /tmp/ff_$3" > /dev/null 2>&1
  echo "== $3 ($2):"
  python3 tools/compare.py "$1" "/tmp/ff_$3" "$2" 2>/dev/null | tail -1
}
run "$FUZZ/content"    "d,t,q50,q61,m" content
run "$FUZZ/typedrift"  "d,t,q50,q61,m" typedrift
run "$FUZZ/hotbucket"  "d,t,q50,q61,m" hotbucket
run "$FUZZ/relcontent" "q,f,st"    relcontent
run "$FUZZ/reltypes"   "q,f,st"    reltypes
run "$FUZZ/relclicks"  "st"        relclicks
run "$FUZZ/embcontent" "s0,s1,s2,d05,d12,t29,m" embcontent
run "$FUZZ/embtypes"   "s0,s1,s2,d05,d12,t29,m" embtypes
echo DONE
