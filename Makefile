# PALLAS_AXON_POOL_IPS= prevents test processes from claiming the single
# remote-TPU tunnel at interpreter start (conftest forces the CPU backend
# anyway); without it a running pytest blocks every TPU job on the host.
test:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -n 4

# fast tier: host-side logic + small-compile tests (see conftest.py
# FAST_FILES); the in-round hygiene gate on a 1-CPU box.  Expected wall
# times per tier are in README.md "Tests".
test-fast:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -m fast

test-serial:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

# opt-in heavyweight oracles (production-dim composed + e2e chains)
test-slow:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q --run-slow -m slow

bench:
	python bench.py

.PHONY: test test-fast test-serial test-slow bench
