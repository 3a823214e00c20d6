import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.ops.prefix_splice import (  # noqa: E402
    T5_SENTINEL_BASE,
    insert_prefix_into_input,
    splice_output_length,
)

S = T5_SENTINEL_BASE


def reference_splice(tokens, text_embeds, prefix_embeds, mask, n):
    """Independent numpy oracle: walk each row left to right, expanding
    each sentinel into its n prefix rows (positional order)."""
    B, L, D = text_embeds.shape
    P = prefix_embeds.shape[1]
    out_len = L + (n - 1) * P
    out = np.zeros((B, out_len, D), dtype=text_embeds.dtype)
    out_mask = np.zeros((B, out_len), dtype=mask.dtype)
    for b in range(B):
        pos = 0
        gap = 0
        for j in range(L):
            tok = tokens[b, j]
            if S - P < tok <= S:
                out[b, pos:pos + n] = prefix_embeds[b, gap]
                out_mask[b, pos:pos + n] = 1
                pos += n
                gap += 1
            else:
                out[b, pos] = text_embeds[b, j]
                out_mask[b, pos] = mask[b, j]
                pos += 1
    return out, out_mask


def make_case(tokens_rows, n, P, D=4, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.asarray(tokens_rows, dtype=np.int32)
    B, L = tokens.shape
    text = rng.standard_normal((B, L, D)).astype(np.float32)
    prefix = rng.standard_normal((B, P, n, D)).astype(np.float32)
    mask = (tokens != 0).astype(np.int32)
    return tokens, text, prefix, mask


class TestInsertPrefix:
    def test_zero_shot(self):
        # one sentinel (<extra_id_0>), n=3
        tokens, text, prefix, mask = make_case(
            [[S, 11, 12, 13, 1]], n=3, P=1
        )
        got, got_mask = insert_prefix_into_input(
            tokens, text, prefix, mask, prefix_length=3, num_prefixes=1
        )
        want, want_mask = reference_splice(tokens, text, prefix, mask, 3)
        assert got.shape == (1, splice_output_length(5, 3, 1), 4)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_mask), want_mask)

    def test_two_shot(self):
        # sentinels <extra_id_0/1/2> interleaved with text, n=2
        rows = [
            [S, 11, 12, S - 1, 13, 14, S - 2, 15, 1],
            [S, 21, 22, S - 1, 23, 24, S - 2, 25, 1],
        ]
        tokens, text, prefix, mask = make_case(rows, n=2, P=3)
        got, got_mask = insert_prefix_into_input(
            tokens, text, prefix, mask, prefix_length=2, num_prefixes=3
        )
        want, want_mask = reference_splice(tokens, text, prefix, mask, 2)
        assert got.shape[1] == 9 + (2 - 1) * 3
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_mask), want_mask)

    def test_padding_rows_differ(self):
        # rows with different amounts of right padding (mask 0) but same
        # static length; sentinel positions differ per row
        rows = [
            [S, 11, 12, 13, 1, 0, 0],
            [S, 21, 1, 0, 0, 0, 0],
        ]
        tokens, text, prefix, mask = make_case(rows, n=4, P=1)
        got, got_mask = insert_prefix_into_input(
            tokens, text, prefix, mask, prefix_length=4, num_prefixes=1
        )
        want, want_mask = reference_splice(tokens, text, prefix, mask, 4)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_mask), want_mask)

    def test_prefix_length_one_is_pure_replacement(self):
        tokens, text, prefix, mask = make_case([[11, S, 12, 1]], n=1, P=1)
        got, got_mask = insert_prefix_into_input(
            tokens, text, prefix, mask, prefix_length=1, num_prefixes=1
        )
        assert got.shape == (1, 4, 4)
        np.testing.assert_allclose(np.asarray(got)[0, 1], prefix[0, 0, 0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got)[0, 0], text[0, 0], rtol=1e-6)

    def test_differentiable_wrt_prefix(self):
        tokens, text, prefix, mask = make_case([[S, 11, 1]], n=2, P=1)

        def loss(p):
            joint, _ = insert_prefix_into_input(
                tokens, text, p, mask, prefix_length=2, num_prefixes=1
            )
            return jnp.sum(joint ** 2)

        grad = jax.grad(loss)(jnp.asarray(prefix))
        np.testing.assert_allclose(
            np.asarray(grad), 2 * prefix, rtol=1e-5
        )

    def test_randomized_against_oracle(self):
        rng = np.random.default_rng(7)
        for trial in range(10):
            P = int(rng.integers(1, 5))
            n = int(rng.integers(1, 6))
            L = int(rng.integers(P + 2, P + 12))
            B = int(rng.integers(1, 4))
            tokens = rng.integers(10, 500, size=(B, L)).astype(np.int32)
            for b in range(B):
                positions = rng.choice(L, size=P, replace=False)
                # positional order of sentinels is arbitrary per row
                for g, j in enumerate(sorted(positions)):
                    tokens[b, j] = S - g
            text = rng.standard_normal((B, L, 4)).astype(np.float32)
            prefix = rng.standard_normal((B, P, n, 4)).astype(np.float32)
            mask = rng.integers(0, 2, size=(B, L)).astype(np.int32)
            got, got_mask = insert_prefix_into_input(
                tokens, text, prefix, mask, prefix_length=n, num_prefixes=P
            )
            want, want_mask = reference_splice(tokens, text, prefix, mask, n)
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-6,
                err_msg=f"trial {trial} P={P} n={n} L={L}",
            )
            np.testing.assert_array_equal(np.asarray(got_mask), want_mask)

    def test_jit_static_shapes(self):
        tokens, text, prefix, mask = make_case([[S, 11, 12, 1]], n=5, P=1)
        fn = jax.jit(
            lambda t, e, p, m: insert_prefix_into_input(
                t, e, p, m, prefix_length=5, num_prefixes=1
            )
        )
        joint, _ = fn(tokens, text, prefix, mask)
        assert joint.shape == (1, 4 + 4, 4)
