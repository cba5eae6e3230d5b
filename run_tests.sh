#!/usr/bin/env bash
# Backend-matrix test runner (the analogue of the reference's feature-
# matrix CI, run_tests.sh:8-47 / SURVEY §4):
#
#   ./run_tests.sh            # CPU jax on the virtual 8-device mesh
#   ./run_tests.sh device     # numeric-parity subset on the REAL chip
#   ./run_tests.sh asan       # native-codec fuzz corpus under ASan
#   ./run_tests.sh pyxtc      # trajectory suite on the pure-Python XTC
#                             # backend (cross-backend validation axis)
#   ./run_tests.sh all        # all of the above
set -euo pipefail
cd "$(dirname "$0")"

mode="${1:-cpu}"

run_cpu() {
  echo "== CPU suite (virtual 8-device mesh) =="
  python -m pytest tests/ -q
}

run_pyxtc() {
  echo "== trajectory suite under GROAN_XTC_BACKEND=py =="
  GROAN_XTC_BACKEND=py python -m pytest \
    tests/test_traj.py tests/test_xtc_backend_py.py tests/test_triclinic.py -q
}

run_device() {
  echo "== device_parity subset on the real chip =="
  GROAN_TEST_PLATFORM="${GROAN_PLATFORM:-axon}" \
    python -m pytest tests/ -m device_parity -q
}

run_asan() {
  echo "== native codec fuzz under AddressSanitizer =="
  python tests/asan_fuzz.py
}

case "$mode" in
  cpu) run_cpu ;;
  device) run_device ;;
  asan) run_asan ;;
  pyxtc) run_pyxtc ;;
  all) run_cpu; run_device; run_asan; run_pyxtc ;;
  *) echo "usage: $0 [cpu|device|asan|pyxtc|all]" >&2; exit 2 ;;
esac
