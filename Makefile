# diffusesg_tpu
.PHONY: test test-fast bench train-vg eval clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_end_to_end.py --ignore=tests/test_cli.py --ignore=tests/test_encodings_e2e.py

bench:
	python bench.py

train-vg:
	python -m diffusesg_tpu.cli.train -c configs/edm_diffuse_sg_regular_visual_genome.yaml

clean:
	rm -rf .jax_cache exp diffusesg_tpu/eval/native/_voc_f1.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
