"""Numeric parity of the flax ResNet-18 trunk against a PyTorch trunk with
identical weights (the torchvision-weight-conversion path,
ref: encoders.py:98 pretrained init; SURVEY.md hard part #3)."""

import numpy as np
import jax.numpy as jnp
import torch

from bevfusion_multimodal_3d_object_detection_tpu.models.resnet import (
    ResNet18Trunk,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.torch_baseline import (
    TorchReferenceDetector,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.torch_convert import (
    convert_resnet18_state_dict,
)


def _torchvision_style_state_dict(model: TorchReferenceDetector):
    """Rename torch_baseline trunk keys into torchvision resnet18 format."""
    sd = model.state_dict()
    out = {}
    ren = {
        "stem.0.": "conv1.",
        "stem.1.": "bn1.",
    }
    for k, v in sd.items():
        if k.startswith("stem.0.") or k.startswith("stem.1."):
            for old, new in ren.items():
                if k.startswith(old):
                    out[k.replace(old, new)] = v
        elif k.startswith("layer"):
            nk = k.replace(".down.0.", ".downsample.0.").replace(
                ".down.1.", ".downsample.1."
            )
            out[nk] = v
    return out


def test_trunk_matches_torch_with_same_weights():
    torch.manual_seed(0)
    tmodel = TorchReferenceDetector().eval()
    sd = _torchvision_style_state_dict(tmodel)
    params, stats = convert_resnet18_state_dict(sd)

    trunk = ResNet18Trunk()
    x = np.random.RandomState(0).randn(1, 32, 64, 3).astype(np.float32)

    y_jax = trunk.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        train=False,
    )

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = tmodel.stem(xt)
        yt = tmodel.layer1(yt)
        yt = tmodel.layer2(yt)
        yt = tmodel.layer3(yt)
        y_torch = yt.numpy().transpose(0, 2, 3, 1)

    assert y_jax.shape == y_torch.shape == (1, 2, 4, 256)
    np.testing.assert_allclose(
        np.asarray(y_jax), y_torch, atol=2e-4, rtol=1e-3
    )


def test_pretrained_camera_key_is_live(tmp_path, tiny_spec):
    """`camera_encoder.pretrained` + `pretrained_path` must actually load the
    torchvision trunk at Trainer.init_state (ref: encoders.py:98) — the key
    may not be parsed-but-dead."""
    import dataclasses

    from conftest import tiny_batch
    from bevfusion_multimodal_3d_object_detection_tpu.config import TrainSpec
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    torch.manual_seed(1)
    tmodel = TorchReferenceDetector().eval()
    sd = _torchvision_style_state_dict(tmodel)
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)

    spec = dataclasses.replace(
        tiny_spec,
        camera=dataclasses.replace(
            tiny_spec.camera, pretrained=True, pretrained_path=path
        ),
    )
    model = MultiModal3DDetector(spec=spec)
    trainer = Trainer(model, TrainSpec(batch_size=2))
    trainer.init_state(tiny_batch())

    expected_params, expected_stats = convert_resnet18_state_dict(sd)
    trunk = trainer.state.params["camera_encoder"]["trunk"]
    np.testing.assert_array_equal(
        np.asarray(trunk["conv1"]["kernel"]),
        expected_params["conv1"]["kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(
            trainer.state.batch_stats["camera_encoder"]["trunk"]["layer3_1"][
                "bn2"
            ]["mean"]
        ),
        expected_stats["layer3_1"]["bn2"]["mean"],
    )


def test_pretrained_true_without_file_warns_not_crashes(tiny_spec, capsys):
    """pretrained: true with no local file must warn and proceed from random
    init (no network egress here), never crash."""
    import dataclasses

    from bevfusion_multimodal_3d_object_detection_tpu.utils import (
        torch_convert,
    )

    spec = dataclasses.replace(
        tiny_spec,
        camera=dataclasses.replace(
            tiny_spec.camera,
            pretrained=True,
            pretrained_path="/nonexistent/resnet18.pth",
        ),
    )
    torch_convert._warned_missing_pretrained = False
    variables = {"params": {}, "batch_stats": {}}
    out, loaded = torch_convert.maybe_load_pretrained_camera(variables, spec)
    assert not loaded and out is variables
    assert "RANDOM" in capsys.readouterr().out


def test_torch_baseline_param_count_matches_jax_flagship():
    """The CPU-baseline torch model must be FLOP/param-equivalent to the JAX
    flagship (~55.2M params) for the benchmark ratio to be fair."""
    tmodel = TorchReferenceDetector()
    n_torch = sum(p.numel() for p in tmodel.parameters())
    assert abs(n_torch - 55_197_715) / 55_197_715 < 0.01
