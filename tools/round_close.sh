#!/bin/bash
# Round-close evidence: run the FULL correctness gate at sf0.01 and
# write the per-query verdicts to a committed artifact
# (CORRECTNESS_local_r<N>.json). Fails — loudly, nonzero — if the
# artifact would be empty or anything short of 100% green, so a round
# can never ship un-evidenced again (round 12 shipped with an empty
# driver-side CORRECTNESS_r12.json; this local twin is the guard).
#
# Usage: tools/round_close.sh <round-number> [verify-out-dir]
set -euo pipefail
N=${1:?round number}
cd "$(dirname "$0")/.."
OUT=${2:-/tmp/verify_round_close_$N}
if [ ! -f "$OUT/oracle_sql.json" ]; then
  rm -rf "$OUT"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
fi
python3 tools/check.py /root/testdata/sf0.01 "$OUT" \
  --json-out "CORRECTNESS_local_r${N}.json"
python3 - "$N" <<'PY'
import json, sys
n = sys.argv[1]
a = json.load(open(f"CORRECTNESS_local_r{n}.json"))
assert a.get("green") and a.get("n_pass", 0) > 0, \
    f"round-close artifact NOT green: {a.get('n_pass')} pass, {a.get('n_fail')} fail"
print(f"round {n} close OK: {a['n_pass']} pass, 0 fail")
PY
