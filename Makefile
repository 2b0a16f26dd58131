.PHONY: test bench native dryrun clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-quick:
	python bench.py --quick --iters 2

native:
	$(MAKE) -C native

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
