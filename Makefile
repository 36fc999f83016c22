# Developer shortcuts. Tests force the JAX CPU backend with a virtual
# 8-device mesh (tests/conftest.py); bench runs on the real TPU.

.PHONY: test test-fast bench train sample grid native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not resume and not modern and not 64x64"

bench:
	python bench.py

train:
	python -m igdm_tpu.cli.train --model ddpm --epochs 100 --timesteps 500

sample:
	python -m igdm_tpu.cli.sample trained_model.npz 16

grid:
	python -m igdm_tpu.cli.grid

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread native/batcher.cpp -o native/libigdmbatcher.so

clean:
	rm -rf .pytest_cache .jax_cache **/__pycache__ native/libigdmbatcher.so
