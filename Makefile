.PHONY: test check check-small bench plans scaling all

test:            ## full pytest suite (oracle-differential, plans, API, parity, streaming, properties)
	python -m pytest tests/ -q

check:           ## driver-contract emulation at sf0.01 (the graded gate)
	python tools/driver_check.py

check-small:     ## fast contract check at sf0.001
	python tools/driver_check.py /root/testdata/sf0.001

bench:           ## headline timings at sf0.1 (one JSON line)
	python bench.py

plans:           ## regenerate PLANS.md plan-evidence artifact
	python tools/dump_plans.py

scaling:         ## regenerate SCALING.md 100x scale-up table
	python tools/scaling_probe.py

all: test check bench
