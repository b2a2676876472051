# Common targets. The python environment is assumed baked (no pip installs).

.PHONY: test test-fast bench native selftest ablation clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not parallel and not e2e and not torch"

bench:
	python bench.py

# Build the C++ point-prep library explicitly (also built lazily on first use)
native:
	g++ -O3 -shared -fPIC -std=c++17 csrc/pointprep.cc -o csrc/libpointprep.so

selftest:
	python -m bevfusion_multimodal_3d_object_detection_tpu.models.encoders
	python -m bevfusion_multimodal_3d_object_detection_tpu.models.fusion

ablation:
	python ablation.py

clean:
	rm -rf .pytest_cache .jax_cache csrc/libpointprep.so
	find . -name __pycache__ -type d -exec rm -rf {} +
