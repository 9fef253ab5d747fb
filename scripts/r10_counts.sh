#!/usr/bin/env bash
# Regenerate every catalog-size number in README.md / SURVEY.md from the
# code itself (VERDICT r9 item 5: counts drifted in three places because
# they were hand-edited). One command, one PlanAudit pass, three patched
# claims:
#   - total / oracled query counts   <- AUDIT_CATALOG (read AFTER the
#     construction loop, so data-fitted oracles are registered)
#   - SURVEY §8 plan census (≤1 / ≤2 exchange totals) <- AUDIT_TOTAL
# Idempotent: reruns rewrite the same sentences in place.
set -euo pipefail
cd /root/repo
export CLS_SNAP=/tmp/graft_cls_counts
rm -rf "$CLS_SNAP"

AUDIT=$(SPARK_DRIVER_MEM=8g scripts/java_run.sh graft.PlanAudit 2>/dev/null \
  | grep -E '^AUDIT_(TOTAL|CATALOG)')
echo "$AUDIT"
N=$(echo "$AUDIT" | grep -oP 'AUDIT_TOTAL n=\K[0-9]+')
LE1=$(echo "$AUDIT" | grep -oP 'le1=\K[0-9]+')
LE2=$(echo "$AUDIT" | grep -oP 'le2=\K[0-9]+')
TOTAL=$(echo "$AUDIT" | grep -oP 'AUDIT_CATALOG total=\K[0-9]+')
ORACLED=$(echo "$AUDIT" | grep -oP 'oracled=\K[0-9]+')
[ "$N" = "$TOTAL" ] || { echo "FATAL: audit n=$N != catalog $TOTAL" >&2; exit 1; }

python3 - "$TOTAL" "$ORACLED" "$LE1" "$LE2" <<'EOF'
import re, sys
total, oracled, le1, le2 = sys.argv[1:5]

def patch(path, subs):
    s = open(path).read()
    for pat, rep in subs:
        s2, n = re.subn(pat, rep, s)
        assert n == 1, f"{path}: pattern {pat!r} matched {n} times (want 1)"
        s = s2
    open(path, "w").write(s)

patch("README.md", [
    (r"catalog is \d+ queries, \d+ of them DuckDB-oracled",
     f"catalog is {total} queries, {oracled} of them DuckDB-oracled"),
])
patch("SURVEY.md", [
    (r"\d+ keys total; \d+ oracled \+ 3 permanently-adjudicated",
     f"{total} keys total; {oracled} oracled + 3 permanently-adjudicated"),
    (r"\d+ of \d+ queries plan ≤1 hash exchange, \d+ plan ≤2",
     f"{le1} of {total} queries plan ≤1 hash exchange, {le2} plan ≤2"),
])
print(f"patched: total={total} oracled={oracled} le1={le1} le2={le2}")
EOF
