.PHONY: test check check-small bench plans scaling all

test:            ## full pytest suite (oracle-differential, plans, API, parity, streaming, properties)
	python -m pytest tests/ -q

check:           ## driver-contract emulation at sf0.01 (the graded gate)
	python tools/driver_check.py

check-small:     ## fast contract check at sf0.001
	python tools/driver_check.py /root/testdata/sf0.001

bench:           ## headline timings at sf0.1 (one JSON line) + regression gate vs last round
	python bench.py | tee /tmp/bench_latest.json
	python tools/bench_diff.py $(shell ls BENCH_r*.json | sort | tail -1) /tmp/bench_latest.json

plans:           ## regenerate PLANS.md plan-evidence artifact
	python tools/dump_plans.py

scaling:         ## regenerate SCALING.md 100x scale-up table
	python tools/scaling_probe.py

all: test check bench
