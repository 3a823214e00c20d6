# Developer conveniences. Tests run on a virtual 8-device CPU mesh;
# bench requires the TPU (run nothing else TPU-bound concurrently).

.PHONY: test test-fast bench bench-generate native lint

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q \
	  --ignore=tests/test_t5_parity.py \
	  --ignore=tests/test_model_wrappers.py \
	  --ignore=tests/test_decoding.py \
	  --ignore=tests/test_beam_search.py

bench:
	python bench.py

bench-generate:
	python bench_generate.py

native:
	python -c "from explicit_alignment_for_vqa_tasks_tpu.native import \
native_available; assert native_available(); print('native VQA eval OK')"
