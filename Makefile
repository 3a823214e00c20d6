# Developer conveniences. Tests run on a virtual 8-device CPU mesh;
# bench requires the TPU (run nothing else TPU-bound concurrently).
#
# Tiers (pytest markers, see pyproject.toml):
#   test-fast  — unmarked tests only: < 2 min on 1 CPU, the pre-commit gate
#   test-heavy — @heavy: full model stacks / e2e CLI / HF parity (~15 min)
#   test-slow  — @slow: real multi-process workers (~10 min)
#   test       — everything (~25-30 min on 1 CPU)

.PHONY: test test-fast test-heavy test-slow bench bench-generate native \
	lint replicate-dryrun

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not heavy and not slow"

test-heavy:
	python -m pytest tests/ -x -q -m heavy

test-slow:
	python -m pytest tests/ -x -q -m slow

bench:
	python bench.py

bench-generate:
	python bench_generate.py

native:
	python -c "from explicit_alignment_for_vqa_tasks_tpu.native import \
native_available; assert native_available(); print('native VQA eval OK')"

# Full dress rehearsal of the real-weights replication run on committed
# tiny fixtures: every published-table mode, int8-vs-bf16 twin, drift
# study, artifact checklist (tools/replicate_dryrun.py). ~10 min on CPU.
replicate-dryrun:
	python -m explicit_alignment_for_vqa_tasks_tpu.tools.replicate_dryrun \
		--workdir /tmp/eavt_replicate_dryrun
