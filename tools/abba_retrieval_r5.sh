#!/bin/bash
# ABBA adjudication of the r4-flagged retrieval_pipeline regression
# (VERDICT r4 "what's wrong" #1): r5 HEAD vs the r3 tree (831edd0,
# worktree at /tmp/kgp_r3).  Interleaved rounds, alternating order,
# fresh JVM per invocation; median of per-round HEAD/r3 ratios is the
# verdict (see BENCH/HOST_DRIFT.md for why single pairs are meaningless).
set -u
HEAD_REPO=/root/repo
R3_REPO=/tmp/kgp_r3
SF=${1:-/root/testdata/sf0.1}
ROUNDS=${2:-4}
OUT=${3:-/tmp/abba_retrieval_r5.jsonl}
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  if [ $((r % 2)) -eq 1 ]; then order="$HEAD_REPO $R3_REPO"; else order="$R3_REPO $HEAD_REPO"; fi
  for repo in $order; do
    python "$HEAD_REPO/tools/abba_two_queries.py" "$repo" "$SF" 3 retrieval_pipeline \
      2>/dev/null | tail -1 >> "$OUT"
  done
done
python - "$OUT" <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {}
for r in rows:
    by.setdefault(r["repo"], []).append(r["times"]["retrieval_pipeline"])
print(json.dumps(by, indent=2))
head = by["/root/repo"]; r3 = by["/tmp/kgp_r3"]
ratios = [h / o for h, o in zip(head, r3)]
print("per-round HEAD/r3 ratios:", [round(x, 3) for x in ratios])
print("median ratio:", round(statistics.median(ratios), 3))
EOF
