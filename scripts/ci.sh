#!/bin/sh
# Full CI: the default (fast) lane plus the slow lane that carries the
# crown-jewel parity tests (training-dynamics parity, preset matrix,
# convergence parity). pytest.ini's `addopts = -m "not slow"` keeps local
# iteration fast, so a regression in the slow-marked tests is invisible to
# `pytest tests/ -x -q` alone (VERDICT r3 weak #5) — run this script (or the
# two commands below) before shipping.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python -m pytest tests/ -x -q -m slow
