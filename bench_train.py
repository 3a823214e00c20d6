"""Secondary benchmark: mapping-network training throughput.

Measures the CC captioning train step (mapper fwd + frozen T0-3B fwd +
backward-through-LM + optax update) in examples/sec/chip. Not part of the
driver bench.py contract; run manually:  python bench_train.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--caption_len", type=int, default=32)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--fused_attention", type=int, default=0,
                        help="enable the fused Pallas encoder attention "
                             "(differentiable via t5_attention_core_vjp)")
    parser.add_argument("--model", choices=["vct0", "clipcap"],
                        default="vct0")
    args = parser.parse_args()

    if args.model == "clipcap":
        _clipcap_main(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
        MapperConfig,
    )
    from explicit_alignment_for_vqa_tasks_tpu.models.t5 import T5Config
    from explicit_alignment_for_vqa_tasks_tpu.models.vct0 import (
        VCT0Config,
        init_vct0_params,
        vct0_caption_loss,
    )

    from explicit_alignment_for_vqa_tasks_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    lm_cfg = T5Config.t0_3b(
        dtype=jnp.bfloat16,
        fused_encoder_attention=bool(args.fused_attention),
    )
    cfg = VCT0Config(
        lm=lm_cfg,
        mapper=MapperConfig(prefix_size=768, d_model=lm_cfg.d_model,
                            prefix_length=10, clip_length=10),
    )
    params = init_vct0_params(jax.random.PRNGKey(0), cfg,
                              param_dtype=jnp.bfloat16)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params["mapper"])

    @jax.jit
    def train_step(mapper, opt_state, lm, clip, labels):
        loss, grads = jax.value_and_grad(vct0_caption_loss)(
            mapper, lm, cfg, clip, labels
        )
        updates, opt_state = tx.update(grads, opt_state, mapper)
        return optax.apply_updates(mapper, updates), opt_state, loss

    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 768)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.integers(2, 30000,
                     size=(args.batch, args.caption_len)).astype(np.int32)
    )

    mapper = params["mapper"]
    t0 = time.perf_counter()
    mapper, opt_state, loss = train_step(
        mapper, opt_state, params["lm"], clip, labels
    )
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.3f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        mapper, opt_state, loss = train_step(
            mapper, opt_state, params["lm"], clip, labels
        )
    loss = float(loss)  # fetch forces execution of the whole chain
    dt = time.perf_counter() - t0
    examples_per_s = args.batch * args.steps / dt
    print(json.dumps({
        "metric": "vct0_3b_mapper_train_examples_per_sec_per_chip",
        "value": round(examples_per_s, 2),
        "unit": "examples/s",
        "config": {"batch": args.batch, "caption_len": args.caption_len,
                   "prefix_length": 10, "final_loss": round(loss, 3),
                   "fused_attention": bool(args.fused_attention)},
    }))


def _clipcap_main(args) -> None:
    """ClipCap mapper-training step (frozen GPT-2): A/B's the fused
    Pallas GPT-2 block (--fused_attention 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from explicit_alignment_for_vqa_tasks_tpu.models.clipcap import (
        ClipCapConfig,
        clipcap_loss,
        init_clipcap_params,
    )
    from explicit_alignment_for_vqa_tasks_tpu.models.gpt2 import GPT2Config
    from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (
        MapperConfig,
    )
    from explicit_alignment_for_vqa_tasks_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    lm_cfg = GPT2Config.gpt2_small(
        dtype=jnp.bfloat16, fused_block=bool(args.fused_attention)
    )
    cfg = ClipCapConfig(
        lm=lm_cfg,
        mapper=MapperConfig(prefix_size=512, d_model=lm_cfg.d_model,
                            prefix_length=10, clip_length=10),
        freeze_lm=True,
    )
    params = init_clipcap_params(jax.random.PRNGKey(0), cfg,
                                 param_dtype=jnp.bfloat16)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params["mapper"])

    @jax.jit
    def train_step(mapper, opt_state, lm, prefix, ids, mask, labels):
        loss, grads = jax.value_and_grad(clipcap_loss)(
            mapper, lm, cfg, prefix, ids, mask, labels
        )
        updates, opt_state = tx.update(grads, opt_state, mapper)
        return optax.apply_updates(mapper, updates), opt_state, loss

    rng = np.random.default_rng(0)
    B, L = args.batch, args.caption_len
    prefix = jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 50000, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    labels = ids

    mapper = params["mapper"]
    t0 = time.perf_counter()
    mapper, opt_state, loss = train_step(
        mapper, opt_state, params["lm"], prefix, ids, mask, labels
    )
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.3f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        mapper, opt_state, loss = train_step(
            mapper, opt_state, params["lm"], prefix, ids, mask, labels
        )
    loss = float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "clipcap_gpt2_mapper_train_examples_per_sec_per_chip",
        "value": round(args.batch * args.steps / dt, 2),
        "unit": "examples/s",
        "config": {"batch": B, "caption_len": L, "prefix_length": 10,
                   "final_loss": round(loss, 3),
                   "fused_block": bool(args.fused_attention)},
    }))


if __name__ == "__main__":
    main()
