#!/usr/bin/env bash
# Test matrix driver (≈ the reference's test.sh: declarative stages from
# test_stages.json, same suite run across execution environments).
#
#   ./test.sh                 # run all default stages
#   ./test.sh unit-fast       # run named stage(s)
#   ./test.sh tpu-smoke tpu-bench
set -u

here="$(cd "$(dirname "$0")" && pwd)"
cd "$here"

stages=("$@")
if [ ${#stages[@]} -eq 0 ]; then
  mapfile -t stages < <(python - <<'EOF'
import json
cfg = json.load(open("test_stages.json"))
print("\n".join(k for k, v in cfg["stages"].items() if v.get("default")))
EOF
)
fi

fail=0
for s in "${stages[@]}"; do
  cmd=$(python - "$s" <<'EOF'
import json, sys
cfg = json.load(open("test_stages.json"))
st = cfg["stages"].get(sys.argv[1])
if st is None:
    sys.exit(f"unknown stage {sys.argv[1]!r}; have: {list(cfg['stages'])}")
print(st["cmd"])
EOF
) || exit 1
  echo "=== stage: $s"
  echo "+ $cmd"
  if ! bash -c "$cmd"; then
    echo "!!! stage $s FAILED"
    fail=1
  fi
done
exit $fail
