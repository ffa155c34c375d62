# kgwas_tpu developer entry points

.PHONY: install test test-fast native bench demo clean

install:
	pip install -e . --no-deps --no-build-isolation

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not distributed and not pallas"

bench:
	python bench.py

demo:
	python demo/kgwas_101.py --cpu --synthetic --data-path /tmp/kgwas_demo \
		--epochs 2 --hidden 64

clean:
	rm -rf build/ *.egg-info kgwas_tpu/native/*.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
