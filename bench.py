"""Throughput benchmark: CLIP ViT image encodings/sec/chip.

Headline metric: ViT-B/32 @ 224px encodings/sec on one chip — the CLIP
model of the reference's default VQA2 config (reference:
configs/vqa2/base_env.jsonnet clip_embeddings paths name
``clip-vit-base-patch32``); target >= 5,000/s/chip (BASELINE.md).
ViT-L/14@336px (the RICES/report model, ~350 GFLOP/image) is reported to
stderr as a secondary metric.

Methodology notes (verified on the axon-tunnelled v5e):
  * inputs are generated ON device — host->device transfer of GB-scale
    random data over the tunnel would dominate and isn't part of the
    metric;
  * each timed step encodes K stacked batches under one ``lax.scan`` and
    reduces to a checksum that is FETCHED to host — through this runtime,
    ``block_until_ready`` alone does not reliably force remote execution,
    so only data fetches are trusted as synchronization points.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time


def bench_vision(cfg_name: str, batch_size: int, k_batches: int = 4,
                 trials: int = 3, use_pallas: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from explicit_alignment_for_vqa_tasks_tpu.models.clip import (
        CLIPVisionConfig,
        clip_encode_image,
        init_clip_vision_params,
    )

    cfg = getattr(CLIPVisionConfig, cfg_name)(
        dtype=jnp.bfloat16, fast_attention=True, fused_attention=True
    )
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    @jax.jit
    def gen(key):
        return jax.random.normal(
            key,
            (k_batches, batch_size, cfg.image_size, cfg.image_size, 3),
            dtype=jnp.bfloat16,
        )

    @jax.jit
    def encode_many(params, stacked):
        def body(carry, images):
            emb = clip_encode_image(
                params, cfg, images, use_pallas=use_pallas
            )
            return carry + jnp.sum(emb.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0), stacked)
        return total

    stacked = gen(jax.random.PRNGKey(1))
    float(encode_many(params, stacked))  # compile + warmup (fetch-forced)

    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        float(encode_many(params, stacked))  # fetch forces execution
        dt = time.perf_counter() - t0
        best = max(best, k_batches * batch_size / dt)
    return {
        "config": cfg_name,
        "batch_size": batch_size,
        "images_per_s": best,
    }


def main() -> None:
    import jax

    from explicit_alignment_for_vqa_tasks_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    device = jax.devices()[0]
    print(f"benchmarking on {device}", file=sys.stderr)

    headline = bench_vision("vit_b_32", batch_size=1024)
    print(f"ViT-B/32@224: {headline['images_per_s']:.0f} img/s",
          file=sys.stderr)

    try:
        secondary = bench_vision("vit_l_14_336", batch_size=128)
        print(f"ViT-L/14@336: {secondary['images_per_s']:.0f} img/s",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover
        print(f"ViT-L/14@336 bench skipped: {exc}", file=sys.stderr)

    baseline = 5000.0  # BASELINE.md target: >=5k encodings/s/chip on v5e
    value = headline["images_per_s"]
    print(json.dumps({
        "metric": "clip_vit_b32_image_encodings_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "images/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
