"""VCT0 / ClipCap wrapper tests: loss gradients flow only to the mapper,
all generate paths run with static shapes, clipcap loss matches HF."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.heavy  # full model stacks; see Makefile tiers
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.clipcap import (  # noqa: E402
    ClipCapConfig,
    ClipCaptionModel,
    clipcap_loss,
    init_clipcap_params,
)
from explicit_alignment_for_vqa_tasks_tpu.models.gpt2 import GPT2Config  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (  # noqa: E402
    MapperConfig,
    init_mapper,
    mapper_apply,
)
from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config  # noqa: E402
from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (  # noqa: E402
    VCT0Config,
    VCT0Model,
    init_vct0_params,
    vct0_caption_loss,
)

S = 32099  # <extra_id_0>


@pytest.fixture(scope="module")
def vct0():
    cfg = VCT0Config(
        lm=T5Config.small_test(),
        mapper=MapperConfig(
            mapping_type="mlp", prefix_size=16, d_model=32, prefix_length=3,
            clip_length=3,
        ),
    )
    params = init_vct0_params(
        jax.random.PRNGKey(0), cfg, param_dtype=jnp.float32
    )
    return VCT0Model(cfg, params)


class TestVCT0:
    def test_caption_loss_and_mapper_grads(self, vct0):
        rng = np.random.default_rng(0)
        clip = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        labels = jnp.asarray([[5, 6, 1, -100], [7, 8, 9, 1]])
        loss = vct0.forward_loss(clip, labels)
        assert np.isfinite(float(loss))

        grads = jax.grad(
            lambda mp: vct0_caption_loss(
                mp, vct0.params["lm"], vct0.cfg, clip, labels
            )
        )(vct0.params["mapper"])
        norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
        assert sum(norms) > 0

    def test_generate_main_path(self, vct0):
        rng = np.random.default_rng(1)
        # 2 prefixes (1 shot + test) spliced at <extra_id_0>, <extra_id_1>
        tokens = np.array(
            [[S, 11, 12, S - 1, 13, 1, 0, 0]], dtype=np.int32
        )
        mask = (tokens != 0).astype(np.int32)
        prefix = jnp.asarray(
            rng.standard_normal((1, 2, 16)).astype(np.float32)
        )
        out_tokens, logprobs = vct0.generate(
            prefix=prefix, question_tokens=jnp.asarray(tokens),
            question_mask=jnp.asarray(mask), max_new_tokens=4,
        )
        assert out_tokens.shape == (1, 4)
        assert logprobs.shape == (1, 4)

    def test_generate_no_prefix(self, vct0):
        tokens = jnp.asarray([[11, 12, 13, 1]], dtype=jnp.int32)
        mask = jnp.ones((1, 4), dtype=jnp.int32)
        out_tokens, _ = vct0.generate(
            question_tokens=tokens, question_mask=mask, no_prefix=True,
            max_new_tokens=3,
        )
        assert out_tokens.shape == (1, 3)

    def test_generate_one_at_a_time(self, vct0):
        rng = np.random.default_rng(2)
        # 2 segments, each with its own sentinel: seg0 -> <extra_id_0>,
        # seg1 -> <extra_id_1>
        tokens = np.array(
            [[[S, 11, 12, 1], [S - 1, 13, 14, 1]]], dtype=np.int32
        )
        mask = np.ones_like(tokens)
        prefix = jnp.asarray(
            rng.standard_normal((1, 2, 16)).astype(np.float32)
        )
        out_tokens, _ = vct0.generate(
            prefix=prefix, question_tokens=jnp.asarray(tokens),
            question_mask=jnp.asarray(mask),
            pass_examples_through_encoder_one_at_a_time=True,
            max_new_tokens=3,
        )
        assert out_tokens.shape == (1, 3)

    def test_one_at_a_time_matches_per_segment_loop(self, vct0):
        """The stacked-batch encode (one t5_encode over (S*B, L)) must
        reproduce the reference's per-segment composition exactly. Pinned
        independently because BOTH production paths (single-device and
        pipelined) share the stacking code — a reshape bug would be
        invisible to their mutual comparison."""
        from explicit_alignment_for_vqa_tasks_tpu.models import t5 as t5_lib
        from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
            _one_at_a_time_segments,
        )
        from explicit_alignment_for_vqa_tasks_tpu.ops.decoding import (
            greedy_decode_t5,
        )

        rng = np.random.default_rng(7)
        B, S, L = 3, 2, 5
        tokens = np.asarray(
            rng.integers(10, 100, size=(B, S, L)), dtype=np.int32
        )
        for i in range(S):
            tokens[:, i, 0] = vct0.cfg.sentinel_base - i  # <extra_id_i>
        tokens = jnp.asarray(tokens)
        mask = jnp.ones((B, S, L), dtype=jnp.int32)
        prefix = jnp.asarray(
            rng.standard_normal((B, S, 16)).astype(np.float32)
        )

        got_tok, got_lp = vct0.generate(
            prefix=prefix, question_tokens=tokens, question_mask=mask,
            pass_examples_through_encoder_one_at_a_time=True,
            max_new_tokens=4,
        )

        # reference composition: S separate encoder passes, concatenated
        lm, mp, cfg = vct0.params["lm"], vct0.params["mapper"], vct0.cfg
        hiddens, masks = [], []
        for seg_in, seg_mask in _one_at_a_time_segments(
            lm, mp, cfg, prefix, tokens, mask, S, True
        ):
            hiddens.append(t5_lib.t5_encode(
                lm, cfg.lm, inputs_embeds=seg_in, attention_mask=seg_mask
            ))
            masks.append(seg_mask)
        want_tok, want_lp = greedy_decode_t5(
            lm, cfg.lm, jnp.concatenate(hiddens, axis=1),
            jnp.concatenate(masks, axis=1), 4,
        )
        np.testing.assert_array_equal(np.asarray(got_tok),
                                      np.asarray(want_tok))
        np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                                   atol=1e-5)

    def test_one_at_a_time_honors_num_beams(self, vct0):
        """num_beams rides through the blockwise-encoder mode (the
        reference forwards it to lm.generate in every path). With ONE
        segment and no prefix, one-at-a-time encodes exactly the full
        input, so its beam output must equal the no_prefix beam path."""
        tokens = jnp.asarray([[11, 12, 13, 1]], dtype=jnp.int32)
        mask = jnp.ones((1, 4), dtype=jnp.int32)
        want_tok, want_lp = vct0.generate(
            question_tokens=tokens, question_mask=mask, no_prefix=True,
            max_new_tokens=4, num_beams=3,
        )
        got_tok, got_lp = vct0.generate(
            question_tokens=tokens[:, None], question_mask=mask[:, None],
            no_prefix=True,
            pass_examples_through_encoder_one_at_a_time=True,
            max_new_tokens=4, num_beams=3,
        )
        np.testing.assert_array_equal(np.asarray(got_tok),
                                      np.asarray(want_tok))
        np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                                   atol=1e-5)

    def test_generate_prefix_only(self, vct0):
        rng = np.random.default_rng(3)
        prefix = jnp.asarray(
            rng.standard_normal((2, 1, 16)).astype(np.float32)
        )
        out_tokens, _ = vct0.generate(prefix=prefix, max_new_tokens=3)
        assert out_tokens.shape == (2, 3)

    def test_beam_with_forced_decoder_raises(self, vct0):
        """The forced-decoder path continues greedily after teacher
        forcing; num_beams > 1 must fail loudly, not silently run greedy
        while the run is recorded as beam search."""
        tokens = jnp.asarray([[S, 11, 12, 1]], dtype=jnp.int32)
        prefix = jnp.zeros((1, 1, 16), dtype=jnp.float32)
        with pytest.raises(ValueError, match="num_beams"):
            vct0.generate(
                prefix=prefix, question_tokens=tokens,
                question_mask=jnp.ones_like(tokens),
                decoder_input_ids=jnp.asarray([[0, 21]], dtype=jnp.int32),
                max_new_tokens=3, num_beams=2,
            )

    def test_beam_prefix_only_raises(self, vct0):
        prefix = jnp.zeros((1, 1, 16), dtype=jnp.float32)
        with pytest.raises(ValueError, match="prefix-only"):
            vct0.generate(prefix=prefix, max_new_tokens=3, num_beams=2)

    def test_generate_forced_decoder(self, vct0):
        rng = np.random.default_rng(4)
        tokens = np.array([[S, 11, 12, 1]], dtype=np.int32)
        mask = np.ones_like(tokens)
        prefix = jnp.asarray(
            rng.standard_normal((1, 1, 16)).astype(np.float32)
        )
        forced = jnp.asarray([[0, 21, 22]], dtype=jnp.int32)
        out_tokens, _ = vct0.generate(
            prefix=prefix, question_tokens=jnp.asarray(tokens),
            question_mask=jnp.asarray(mask), decoder_input_ids=forced,
            max_new_tokens=3,
        )
        assert out_tokens.shape == (1, 3)


class TestClipCap:
    @pytest.fixture(scope="class")
    def model(self):
        cfg = ClipCapConfig(
            lm=GPT2Config.small_test(),
            mapper=MapperConfig(
                mapping_type="mlp", prefix_size=16, d_model=32,
                prefix_length=4, clip_length=4,
            ),
        )
        params = init_clipcap_params(
            jax.random.PRNGKey(1), cfg, param_dtype=jnp.float32
        )
        return ClipCaptionModel(cfg, params)

    def test_loss_matches_hf(self, model):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.GPT2Config(
            vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        torch.manual_seed(0)
        hf_model = transformers.GPT2LMHeadModel(hf_cfg).eval()
        from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (
            gpt2_params_from_hf,
        )
        params = {
            "lm": jax.tree.map(
                jnp.asarray, gpt2_params_from_hf(hf_model.state_dict(),
                                                 model.cfg.lm)
            ),
            "mapper": model.params["mapper"],
        }
        rng = np.random.default_rng(5)
        prefix = rng.standard_normal((2, 16)).astype(np.float32)
        ids = rng.integers(0, 128, size=(2, 6)).astype(np.int64)
        mask = np.ones((2, 6), dtype=np.int64)
        labels = ids.copy()
        labels[:, :2] = -100

        # replicate with HF: embed prefix via our mapper, concat, HF loss
        from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
            mapper_apply,
        )
        proj = np.asarray(mapper_apply(
            model.cfg.mapper, params["mapper"], jnp.asarray(prefix)
        )).reshape(2, 4, 32)
        with torch.no_grad():
            tok_emb = hf_model.transformer.wte(torch.tensor(ids))
            cat = torch.cat([torch.tensor(proj), tok_emb], dim=1)
            full_labels = torch.cat(
                [torch.full((2, 4), -100, dtype=torch.long),
                 torch.tensor(labels)], dim=1,
            )
            full_mask = torch.cat(
                [torch.ones(2, 4, dtype=torch.long), torch.tensor(mask)],
                dim=1,
            )
            want = hf_model(
                inputs_embeds=cat, labels=full_labels,
                attention_mask=full_mask,
            ).loss.item()

        got = float(clipcap_loss(
            params["mapper"], params["lm"], model.cfg,
            jnp.asarray(prefix), jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
            jnp.asarray(labels),
        ))
        assert abs(got - want) < 2e-4

    def test_generate(self, model):
        rng = np.random.default_rng(6)
        prefix = jnp.asarray(
            rng.standard_normal((2, 1, 16)).astype(np.float32)
        )
        ids = jnp.asarray(
            rng.integers(0, 128, size=(2, 5)).astype(np.int32)
        )
        mask = jnp.ones((2, 5), dtype=jnp.int32)
        tokens, logprobs = model.generate(prefix, ids, mask, max_new_tokens=4)
        assert tokens.shape == (2, 4)

    def test_mapper_grads_only(self, model):
        rng = np.random.default_rng(7)
        prefix = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
        ids = jnp.asarray([[3, 4, 5]], dtype=jnp.int32)
        mask = jnp.ones((1, 3), dtype=jnp.int32)
        labels = jnp.asarray([[3, 4, 5]])
        grads = jax.grad(
            lambda mp: clipcap_loss(
                mp, model.params["lm"], model.cfg, prefix, ids, mask, labels
            )
        )(model.params["mapper"])
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(total) and total > 0


class TestMappers:
    @pytest.mark.parametrize("mapping_type", ["mlp", "transformer",
                                              "perceiver"])
    def test_shapes(self, mapping_type):
        cfg = MapperConfig(
            mapping_type=mapping_type, prefix_size=16, d_model=32,
            prefix_length=5, clip_length=4, num_layers=2,
        )
        params = init_mapper(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 3, 16))
        out = mapper_apply(cfg, params, x)
        assert out.shape == (2, 3, 5 * 32)

    @pytest.mark.parametrize("mapping_type", ["mlp", "transformer",
                                              "perceiver"])
    def test_gradients(self, mapping_type):
        cfg = MapperConfig(
            mapping_type=mapping_type, prefix_size=8, d_model=16,
            prefix_length=2, clip_length=2, num_layers=2,
        )
        params = init_mapper(jax.random.PRNGKey(1), cfg)
        x = jnp.ones((1, 8))
        grads = jax.grad(
            lambda p: jnp.sum(mapper_apply(cfg, p, x) ** 2)
        )(params)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(total) and total > 0
