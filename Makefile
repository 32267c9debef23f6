# Common targets. See CLAUDE.md for environment notes.

.PHONY: ext test test-fast bench bench-train entry clean

ext:
	python setup.py build_ext --inplace

test: ext
	python -m pytest tests/ -q

test-fast: ext
	python -m pytest tests/ -x -q -k "not parity"

bench:
	python bench.py

# Refresh the committed persistent compile cache (.jax_cache/) so the
# driver's end-of-round bench run warm-starts instead of paying minutes of
# remote first-compile. Run on the real chip after any change to the benched
# program, then commit the new/changed .jax_cache blobs.
bench-cache:
	rm -rf .jax_cache && python bench.py && du -sh .jax_cache

bench-train:
	python bench_train.py

bench-data:
	python bench_data.py

trace-train:
	python bench_train_trace.py

entry:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py

clean:
	rm -rf build mode_diffusion_policy_tpu/native/*.so __pycache__
