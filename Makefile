# Developer entry points. CPU tests force an 8-device virtual mesh
# (tests/conftest.py); tests_tpu needs a real TPU and skips itself otherwise.

.PHONY: test test-tpu bench bench-quick multichip smoke

test:
	python -m pytest tests/ -q

test-tpu:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

bench-quick:
	python bench.py --quick

multichip:
	python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

smoke:
	python -m ip_avsr_tpu.cli.nstream --config configs/synthetic_1stream.ini --synthetic 60

notebook:
	python scripts/run_notebook.py

coverage:
	COV_OUT=/tmp/cov.json python -m pytest tests/ -q -p scripts.coverage
	python scripts/coverage.py report /tmp/cov.json

e2e:
	bash scripts/e2e_workflow.sh /tmp/ipavsr_e2e
