"""RICES at real VQA2 scale, fully device-resident (round-1 review #7).

The reference pipeline is 4 separate FAISS/pandas stages over pickles
(reference: src/in_context_example_selection/*, shapes from
get_question_knn.py:65-83: 443,757 train / 214,354 val questions, 768-d
CLIP embeddings, k=2048). TPU-native formulation: the entire compute —
question top-k, image scoring within each question pool, joint ranking —
is ONE jitted program per val chunk, with the train matrices resident in
HBM and only the final top-32 examples (M x 32) fetched to host. The
443k x 2048 intermediate tables never cross the host boundary.

Run on the chip:
    python -m explicit_alignment_for_vqa_tasks_tpu.tools.rices_at_scale
Synthetic embeddings are generated ON device (host->device transfer over
this environment's relay would otherwise dominate and is not part of the
metric). Emits one JSON line with queries/sec.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_train", type=int, default=443_757)
    parser.add_argument("--n_val", type=int, default=214_354)
    parser.add_argument("--n_images", type=int, default=82_783)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--k", type=int, default=2048)
    parser.add_argument("--top_examples", type=int, default=32)
    parser.add_argument("--query_chunk", type=int, default=1024)
    parser.add_argument("--max_chunks", type=int, default=0,
                        help="0 = all; >0 limits chunks (quick check)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.knn import l2_normalize
    from ..utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k_tt, k_ti, k_vt, k_vi, k_map = jax.random.split(key, 5)

    @jax.jit
    def gen():
        train_text = l2_normalize(jax.random.normal(
            k_tt, (args.n_train, args.dim), dtype=jnp.float32))
        train_img = l2_normalize(jax.random.normal(
            k_ti, (args.n_images, args.dim), dtype=jnp.float32))
        img_idx = jax.random.randint(
            k_map, (args.n_train,), 0, args.n_images, dtype=jnp.int32)
        return train_text, train_img, img_idx

    train_text, train_img, img_idx = gen()

    @functools.partial(jax.jit, donate_argnums=())
    def rices_chunk(train_text, train_img, img_idx, q_text, q_img):
        """Stages 1-4 for one val chunk, all in HBM."""
        s1 = jnp.dot(q_text, train_text.T,
                     preferred_element_type=jnp.float32)        # (C, N)
        q_sims, q_idx = jax.lax.top_k(s1, args.k)               # (C, K)
        s3 = jnp.dot(q_img, train_img.T,
                     preferred_element_type=jnp.float32)        # (C, U)
        cand = img_idx[q_idx]                                   # (C, K)
        i_sims = jnp.take_along_axis(s3, cand, axis=1)          # (C, K)
        joint = q_sims + i_sims
        j_sims, j_pos = jax.lax.top_k(joint, args.top_examples)
        j_train_rows = jnp.take_along_axis(q_idx, j_pos, axis=1)
        return j_sims, j_train_rows

    n_chunks = -(-args.n_val // args.query_chunk)
    if args.max_chunks:
        n_chunks = min(n_chunks, args.max_chunks)

    def make_queries(i):
        kq = jax.random.fold_in(k_vt, i)
        ki = jax.random.fold_in(k_vi, i)
        return (
            l2_normalize(jax.random.normal(
                kq, (args.query_chunk, args.dim), dtype=jnp.float32)),
            l2_normalize(jax.random.normal(
                ki, (args.query_chunk, args.dim), dtype=jnp.float32)),
        )

    # compile + warmup (fetch-forced)
    q_text, q_img = make_queries(0)
    t0 = time.perf_counter()
    sims, rows = rices_chunk(train_text, train_img, img_idx, q_text, q_img)
    _ = float(sims.sum())
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    out_sims, out_rows = [], []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        q_text, q_img = make_queries(i)
        sims, rows = rices_chunk(
            train_text, train_img, img_idx, q_text, q_img
        )
        # fetch the small (C, 32) results — the pipeline's real output
        out_sims.append(np.asarray(sims))
        out_rows.append(np.asarray(rows))
    device_dt = time.perf_counter() - t0

    # host finalize: ascending best-last ordering (reference contract)
    t0 = time.perf_counter()
    all_rows = np.concatenate(out_rows)[:, ::-1]
    all_sims = np.concatenate(out_sims)[:, ::-1]
    host_dt = time.perf_counter() - t0
    n_queries = n_chunks * args.query_chunk

    print(json.dumps({
        "metric": "rices_vqa2_scale_queries_per_sec_per_chip",
        "value": round(n_queries / device_dt, 1),
        "unit": "queries/s",
        "config": {
            "n_train": args.n_train, "n_val_processed": n_queries,
            "n_images": args.n_images, "dim": args.dim, "k": args.k,
            "query_chunk": args.query_chunk,
            "device_seconds": round(device_dt, 2),
            "host_finalize_seconds": round(host_dt, 3),
            "projected_full_val_minutes": round(
                args.n_val / (n_queries / device_dt) / 60, 2
            ),
            "checksum": float(all_sims.sum()),
            "rows_shape": list(all_rows.shape),
        },
    }))


if __name__ == "__main__":
    main()
