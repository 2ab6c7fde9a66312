#!/bin/bash
# Deterministic tiny-config golden test (test/dlrm_s_test.sh equivalent).
#
# The reference diffs pytorch-vs-caffe2 debug output; our oracle is a stored
# golden log: the CLI run is fully deterministic (numpy seeding identical to
# the reference), so any numeric change in init, data generation, forward,
# loss, or the optimizer shows up as a diff. Regenerate goldens with
# REGEN=1 after intentional changes.
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

golden_dir=test_scripts/golden
mkdir -p "$golden_dir"
status=0

run_config () {
  name=$1; shift
  log=$(mktemp)
  python -m dlrm_tpu.cli "$@" 2>/dev/null | grep -v "ms/it.*-1.00" > /dev/null  # warm check
  python -m dlrm_tpu.cli "$@" 2>/dev/null > "$log"
  if [ "${REGEN:-0}" = "1" ] || [ ! -f "$golden_dir/$name.log" ]; then
    cp "$log" "$golden_dir/$name.log"
    echo "$name: golden (re)generated"
  elif diff -q "$golden_dir/$name.log" "$log" > /dev/null; then
    echo "$name: PASSED"
  else
    echo "$name: FAILED"
    diff "$golden_dir/$name.log" "$log" | head -20
    status=1
  fi
  rm -f "$log"
}

# the four tiny configs of test/dlrm_s_test.sh:22-47
run_config tiny1 --mini-batch-size=1 --data-size=1
run_config tiny2 --mini-batch-size=2 --data-size=4 --nepochs=2
run_config tiny3 --mini-batch-size=2 --data-size=5 --nepochs=3 --debug-mode
run_config tiny4 --mini-batch-size=2 --data-size=6 --loss-function=bce --round-targets=True

exit $status
