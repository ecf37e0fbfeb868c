# PALLAS_AXON_POOL_IPS= prevents test processes from claiming the single
# remote-TPU tunnel at interpreter start (conftest forces the CPU backend
# anyway); without it a running pytest blocks every TPU job on the host.
test:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -n 4

test-serial:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

bench:
	python bench.py

.PHONY: test test-par bench
