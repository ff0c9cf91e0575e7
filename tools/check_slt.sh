#!/bin/bash
# Regenerate the SLT corpus into a scratch dir and diff it against the
# frozen files under src/test/resources/slt. The generator's families
# share one seeded rng stream, so ANY edit that adds/removes a draw
# re-freezes every family generated after it — this check makes that
# visible before commit instead of three rounds later (the r12 selfjoin
# drift). Run after every gen_slt.py change:
#   tools/check_slt.sh            # expect: corpus in sync
# pg_date/pg_timestamp have their own generators and are checked too.
set -euo pipefail
cd "$(dirname "$0")/.."
SCRATCH=$(mktemp -d /tmp/slt_check.XXXXXX)
trap 'rm -rf "$SCRATCH"' EXIT
SLT_OUT="$SCRATCH" python3 tools/gen_slt.py >/dev/null
SLT_OUT="$SCRATCH" python3 tools/gen_slt2.py >/dev/null
SLT_OUT="$SCRATCH" python3 tools/gen_pg_date.py >/dev/null 2>&1 || true
SLT_OUT="$SCRATCH" python3 tools/gen_pg_timestamp.py >/dev/null 2>&1 || true
FAIL=0
for f in "$SCRATCH"/*.test; do
  base=$(basename "$f")
  if ! diff -q "src/test/resources/slt/$base" "$f" >/dev/null 2>&1; then
    echo "DRIFT: $base differs from generator output"
    FAIL=1
  fi
done
if [ "$FAIL" = 0 ]; then
  echo "corpus in sync ($(ls "$SCRATCH"/*.test | wc -l) generated families checked)"
else
  exit 1
fi
