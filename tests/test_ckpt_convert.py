"""Reference-checkpoint mapper conversion: torch Linear weights -> our
pytree, numerically identical forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.hf_convert import (  # noqa: E402
    mapper_params_from_reference_ckpt,
)
from explicit_alignment_for_vqa_tasks_tpu.models.mappers import (  # noqa: E402
    MapperConfig,
    mapper_apply,
)

PREFIX_SIZE, D_MODEL, N = 16, 32, 4


def torch_mlp():
    import torch.nn as nn

    hidden = (D_MODEL * N) // 2
    return nn.Sequential(
        nn.Linear(PREFIX_SIZE, hidden), nn.Tanh(),
        nn.Linear(hidden, D_MODEL * N),
    )


class TestMapperConversion:
    def test_mlp_forward_matches_torch(self):
        torch.manual_seed(0)
        mlp = torch_mlp().eval()
        # PL-style state dict: model.clip_project.model.{0,2}
        state_dict = {
            f"model.clip_project.model.{i}.{kind}": p
            for i, layer in ((0, mlp[0]), (2, mlp[2]))
            for kind, p in (("weight", layer.weight), ("bias", layer.bias))
        }
        params = jax.tree.map(
            jnp.asarray,
            mapper_params_from_reference_ckpt(state_dict, "mlp"),
        )
        cfg = MapperConfig(mapping_type="mlp", prefix_size=PREFIX_SIZE,
                           d_model=D_MODEL, prefix_length=N, clip_length=N)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, PREFIX_SIZE)).astype(np.float32)
        with torch.no_grad():
            want = mlp(torch.tensor(x)).numpy()
        got = np.asarray(mapper_apply(cfg, params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_missing_clip_project_raises(self):
        with pytest.raises(ValueError):
            mapper_params_from_reference_ckpt(
                {"model.lm.encoder.weight": torch.zeros(2)}, "mlp"
            )

    def test_convert_tool_roundtrip(self, tmp_path):
        from explicit_alignment_for_vqa_tasks_tpu.tools.\
            convert_reference_checkpoint import convert
        from explicit_alignment_for_vqa_tasks_tpu.trainers.checkpointing \
            import load_checkpoint

        torch.manual_seed(2)
        mlp = torch_mlp()
        state_dict = {
            f"model.clip_project.model.{i}.{kind}": p
            for i, layer in ((0, mlp[0]), (2, mlp[2]))
            for kind, p in (("weight", layer.weight), ("bias", layer.bias))
        }
        ckpt = tmp_path / "model_04.ckpt"
        torch.save({"state_dict": state_dict}, ckpt)
        out = tmp_path / "converted"
        convert(str(ckpt), "mlp", str(out))
        restored = load_checkpoint(str(out))
        assert "mapper" in restored
        np.testing.assert_allclose(
            np.asarray(restored["mapper"]["fc1"]["w"]),
            mlp[0].weight.detach().numpy().T, rtol=1e-6,
        )
