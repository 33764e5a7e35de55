# Developer entry points. CPU tests force an 8-device virtual mesh
# (tests/conftest.py); tests_tpu needs a real TPU and skips itself otherwise.

.PHONY: test test-tpu bench bench-quick multichip smoke parity-real parity-rehearse scaling-pins

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

# Real-corpus accuracy parity vs the reference (north-star check). DATA is
# the directory holding the corpus .mat files; REF_CR the reference run's
# classification rate (fraction). CONFIG defaults to AVLetters unimodal.
CONFIG ?= configs/avletters_1stream.ini
parity-real:
	python -m ip_avsr_tpu.cli.parity_check --data $(DATA) --config $(CONFIG) \
	    $(if $(REF_CR),--reference-cr $(REF_CR),)

# End-to-end rehearsal of the parity harness on a fabricated full-scale
# AVLetters-shaped corpus (no real data needed).
parity-rehearse:
	python -m ip_avsr_tpu.cli.parity_check --rehearse

# Regenerate the compiler-accounted scaling-pins table in docs/SCALING.md.
scaling-pins:
	python scripts/scaling_pins.py --update
