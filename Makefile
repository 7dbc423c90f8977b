# Developer workflow targets (the reference ships a similar Makefile,
# rtvp/Makefile: venv/install/run/test/demo/clean/lint/format).

PY ?= python

.PHONY: test demo run bench lint format clean docs

test:
	$(PY) -m pytest tests/ -q

demo:
	$(PY) -m sspv_tpu.demo

run:
	$(PY) -m sspv_tpu.main

bench:
	$(PY) bench.py

lint:
	$(PY) -m flake8 sspv_tpu tests --max-line-length=100 || true

format:
	$(PY) -m black sspv_tpu tests --line-length=100 || true

clean:
	rm -rf .pytest_cache **/__pycache__ sspv_snapshot.png

docs:
	$(PY) scripts/build_docs.py
