import os

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.models import get_backbone
from maskrcnn_tf2_tpu.models.backbones.pretrained import (
    _flatten,
    convert_torch_resnet,
    load_backbone_params,
    load_npz_into_variables,
    save_backbone_npz,
)


def init_resnet18():
    model = get_backbone("resnet18", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    return model, model.init({"params": jax.random.PRNGKey(0)}, x, train_bn=False)


def fake_torch_resnet18_state_dict(variables):
    """Build a synthetic torchvision-named state_dict with shapes derived
    from our flax resnet18 (reverse mapping)."""
    import torch

    sd = {}
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])

    def conv_t(path):
        k = np.asarray(flat[path])
        return torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())

    sd["conv1.weight"] = conv_t(("stem", "conv", "kernel"))
    sd["bn1.weight"] = torch.from_numpy(np.asarray(flat[("stem", "bn", "scale")]).copy())
    sd["bn1.bias"] = torch.from_numpy(np.asarray(flat[("stem", "bn", "bias")]).copy())
    sd["bn1.running_mean"] = torch.from_numpy(
        np.asarray(stats[("stem", "bn", "mean")]).copy()
    )
    sd["bn1.running_var"] = torch.from_numpy(
        np.asarray(stats[("stem", "bn", "var")]).copy()
    )
    for stage, blocks in enumerate([2, 2, 2, 2], start=1):
        for b in range(blocks):
            ours = f"stage{stage}_block{b + 1}"
            for ci in (1, 2):
                sd[f"layer{stage}.{b}.conv{ci}.weight"] = conv_t(
                    (ours, f"conv{ci}", "conv", "kernel")
                )
                for tleaf, fleaf, src in [
                    ("weight", "scale", flat),
                    ("bias", "bias", flat),
                    ("running_mean", "mean", stats),
                    ("running_var", "var", stats),
                ]:
                    sd[f"layer{stage}.{b}.bn{ci}.{tleaf}"] = torch.from_numpy(
                        np.asarray(src[(ours, f"conv{ci}", "bn", fleaf)]).copy()
                    )
            if (ours, "downsample", "conv", "kernel") in flat:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = conv_t(
                    (ours, "downsample", "conv", "kernel")
                )
                for tleaf, fleaf, src in [
                    ("weight", "scale", flat),
                    ("bias", "bias", flat),
                    ("running_mean", "mean", stats),
                    ("running_var", "var", stats),
                ]:
                    sd[f"layer{stage}.{b}.downsample.1.{tleaf}"] = torch.from_numpy(
                        np.asarray(src[(ours, "downsample", "bn", fleaf)]).copy()
                    )
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_torch_resnet_conversion_roundtrip(tmp_path):
    model, variables = init_resnet18()
    sd = fake_torch_resnet18_state_dict(variables)
    converted = convert_torch_resnet(sd)
    # every original param/stat is recovered exactly
    for coll in ("params", "batch_stats"):
        orig = _flatten(variables[coll])
        conv = _flatten(converted[coll])
        assert set(conv) == set(orig), (
            sorted(set(orig) - set(conv))[:5],
            sorted(set(conv) - set(orig))[:5],
        )
        for p in orig:
            np.testing.assert_allclose(np.asarray(conv[p]), np.asarray(orig[p]), atol=0)


def test_load_torch_checkpoint_into_model(tmp_path):
    import torch

    model, variables = init_resnet18()
    sd = fake_torch_resnet18_state_dict(variables)
    path = os.path.join(tmp_path, "r18.pt")
    torch.save(sd, path)
    # embed backbone under the full-model layout {'params': {'backbone': ...}}
    wrapped = {
        "params": {"backbone": variables["params"]},
        "batch_stats": {"backbone": variables["batch_stats"]},
    }
    # zero out, then load back
    zeroed = jax.tree.map(jnp.zeros_like, wrapped)
    restored, n = load_backbone_params(zeroed, path)
    assert n > 50
    got = _flatten(restored["params"]["backbone"])
    want = _flatten(variables["params"])
    for p in want:
        np.testing.assert_allclose(np.asarray(got[p]), np.asarray(want[p]))


def test_npz_roundtrip(tmp_path):
    model, variables = init_resnet18()
    path = os.path.join(tmp_path, "bb.npz")
    save_backbone_npz(variables, path)
    zeroed = jax.tree.map(jnp.zeros_like, dict(variables))
    restored, n = load_npz_into_variables(zeroed, path)
    assert n >= 100
    got = _flatten(restored["params"])
    want = _flatten(variables["params"])
    for p in want:
        np.testing.assert_allclose(np.asarray(got[p]), np.asarray(want[p]))
