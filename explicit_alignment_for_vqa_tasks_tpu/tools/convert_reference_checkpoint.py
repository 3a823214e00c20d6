"""Convert a reference (torch/PL) mapper checkpoint to this framework.

The reference's checkpoints are full LightningModule state dicts; only the
mapping network (``model.clip_project.*``) is trainable (reference:
src/models/vct0.py:535-544), so that is the payload converted here — into
an Orbax checkpoint loadable by our executors.

Usage:
    python -m explicit_alignment_for_vqa_tasks_tpu.tools.\
convert_reference_checkpoint \
        --ckpt .../model_04.ckpt --mapping_type mlp \
        --out .../saved_model/model_04
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def convert(ckpt_path: str, mapping_type: str, out_path: str) -> str:
    import jax.numpy as jnp
    import torch

    from ..models.hf_convert import mapper_params_from_reference_ckpt
    from ..trainers.checkpointing import _checkpointer

    payload = torch.load(ckpt_path, map_location="cpu",
                         weights_only=False)
    state_dict = payload.get("state_dict", payload)
    mapper = mapper_params_from_reference_ckpt(state_dict, mapping_type)
    import jax

    mapper = jax.tree.map(jnp.asarray, mapper)
    import os

    _checkpointer().save(os.path.abspath(out_path), {"mapper": mapper},
                         force=True)
    logger.info("converted %s -> %s", ckpt_path, out_path)
    return out_path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--mapping_type", default="mlp",
                        choices=["mlp", "transformer"])
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    convert(args.ckpt, args.mapping_type, args.out)


if __name__ == "__main__":
    main()
