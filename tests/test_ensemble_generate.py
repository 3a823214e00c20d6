"""Unit tests for trainers.few_shot_vqa_executor.ensemble_generate —
the chunked/batched ensemble-member generation used by the flagship
eval executor and bench_generate.py (fast-tier twin of the full-stack
equality e2e in tests/test_e2e.py::test_batched_ensembles_match_looped).

Reference semantics: src/trainers/few_shot_vqa_executor.py:293-332
(per-member generate + summed-log-prob argmax pick).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.trainers.few_shot_vqa_executor import (  # noqa: E402
    ensemble_generate,
)

B, E, L, P, D, T = 3, 5, 7, 4, 6, 4


class StubModel:
    """Deterministic row-wise 'generate': tokens/logprobs depend only on
    each row's own inputs, like the real model — so batched and looped
    dispatch must agree exactly. Records call shapes for chunk checks."""

    def __init__(self):
        self.calls = []

    def generate(self, prefix, question_tokens, question_mask,
                 no_prefix=False, num_shots=None, max_new_tokens=4,
                 num_beams=1, **kw):
        self.calls.append({
            "rows": int(question_tokens.shape[0]),
            "prefix_shape": tuple(prefix.shape),
        })
        rows = question_tokens.shape[0]
        # tokens: derived from the row's input ids (ids > 2 so none are
        # skipped by sequence_scores)
        base = jnp.sum(question_tokens, axis=1, keepdims=True) % 97 + 3
        tokens = base + jnp.arange(max_new_tokens)[None, :]
        # logprobs: a deterministic per-row score mixing prefix content,
        # so the argmax member pick is exercised (not all-equal)
        score = jnp.sum(prefix.reshape(rows, -1), axis=1, keepdims=True)
        logprobs = jnp.broadcast_to(
            jnp.sin(score), (rows, max_new_tokens)
        )
        return tokens.astype(jnp.int32), logprobs


def _inputs(mode, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 50, size=(B, E, L)).astype(np.int32)
    mask = np.ones((B, E, L), np.int32)
    if mode == "one_shot":
        # (B, shots+1, D): E members each pair shot i with the LAST
        # (test-image) embedding
        clip = rng.standard_normal((B, E + 1, D)).astype(np.float32)
    else:
        # (B, E, P, D): member i uses its own full permutation set
        clip = rng.standard_normal((B, E, P, D)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(clip)


@pytest.mark.parametrize("mode", ["permutation", "one_shot"])
@pytest.mark.parametrize("m", [2, 3, 5, 99])
def test_batched_matches_looped(mode, m):
    ids, mask, clip = _inputs(mode)
    num_shots = 1 if mode == "one_shot" else None
    looped = ensemble_generate(
        StubModel(), ids, mask, clip, num_ensembles=E, num_shots=num_shots,
        no_prefix=False, max_new_tokens=T, mode=mode, members_per_call=1,
    )
    batched = ensemble_generate(
        StubModel(), ids, mask, clip, num_ensembles=E, num_shots=num_shots,
        no_prefix=False, max_new_tokens=T, mode=mode, members_per_call=m,
    )
    np.testing.assert_array_equal(looped, batched)


def test_chunk_shapes_and_call_count():
    ids, mask, clip = _inputs("permutation")
    stub = StubModel()
    ensemble_generate(
        stub, ids, mask, clip, num_ensembles=E, num_shots=None,
        no_prefix=False, max_new_tokens=T, mode="permutation",
        members_per_call=2,
    )
    # E=5, m=2 -> chunks of 2, 2, 1 members folded into the batch dim
    assert [c["rows"] for c in stub.calls] == [B * 2, B * 2, B * 1]
    assert stub.calls[0]["prefix_shape"] == (B * 2, P, D)


def test_one_shot_member_clip_pairs_shot_with_test_image():
    """In one_shot mode each member's prefix must be (shot_i, test_image)
    — exactly the reference's jnp.stack([clip[:, i], clip[:, -1]])."""
    ids, mask, clip = _inputs("one_shot")

    class Recorder(StubModel):
        def __init__(self):
            super().__init__()
            self.prefixes = []

        def generate(self, prefix, *a, **kw):
            self.prefixes.append(np.asarray(prefix))
            return super().generate(prefix, *a, **kw)

    rec = Recorder()
    ensemble_generate(
        rec, ids, mask, clip, num_ensembles=E, num_shots=1,
        no_prefix=False, max_new_tokens=T, mode="one_shot",
        members_per_call=2,
    )
    clip_np = np.asarray(clip)
    got = np.concatenate(
        [p.reshape(B, -1, 2, D) for p in rec.prefixes], axis=1
    )  # (B, E, 2, D)
    for i in range(E):
        np.testing.assert_array_equal(got[:, i, 0], clip_np[:, i])
        np.testing.assert_array_equal(got[:, i, 1], clip_np[:, -1])
