"""Serving-graph BN folding (utils/fold_bn.py): the folded camera model must
reproduce the unfolded eval-mode outputs exactly (up to float assoc)."""

import numpy as np
import jax
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    CameraEncoderSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.models import (
    MultiModal3DDetector,
)
from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
    ResNetCameraEncoder,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.fold_bn import (
    fold_bn_params,
    fold_camera_variables,
)

from conftest import tiny_batch


def _nontrivial_bn_stats(variables, key):
    """Perturb BN running stats/affine params so folding is actually
    exercised (fresh init has mean=0, var=1, scale=1, bias=0 — folding
    would be trivially correct)."""

    def perturb(tree, rng):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb(v, rng)
            else:
                r = jax.random.normal(rng.pop(), v.shape) * 0.3
                if k in ("var",):
                    out[k] = jnp.abs(v + r) + 0.1
                elif k in ("mean", "scale", "bias"):
                    out[k] = v + r
                else:
                    out[k] = v
        return out

    class _Keys:
        def __init__(self, key):
            self.key = key

        def pop(self):
            self.key, sub = jax.random.split(self.key)
            return sub

    keys = _Keys(key)
    variables = dict(variables)
    variables["batch_stats"] = perturb(variables["batch_stats"], keys)
    # also perturb BN affine params
    def perturb_params(tree, rng):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "scale" in v and "bias" in v and "kernel" not in v:
                    out[k] = {
                        "scale": v["scale"]
                        + jax.random.normal(rng.pop(), v["scale"].shape) * 0.2,
                        "bias": v["bias"]
                        + jax.random.normal(rng.pop(), v["bias"].shape) * 0.2,
                    }
                else:
                    out[k] = perturb_params(v, rng)
            else:
                out[k] = v
        return out

    variables["params"] = perturb_params(variables["params"], keys)
    return variables


def test_folded_camera_encoder_matches_unfolded():
    enc = ResNetCameraEncoder(spec=CameraEncoderSpec(image_size=(32, 64)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    variables = _nontrivial_bn_stats(variables, jax.random.PRNGKey(2))

    want = enc.apply(variables, x, train=False)

    folded_params = fold_bn_params(
        variables["params"], variables["batch_stats"]
    )
    enc_folded = ResNetCameraEncoder(
        spec=CameraEncoderSpec(image_size=(32, 64)), fold_bn=True
    )
    # the folded tree must slot exactly into the folded module
    init_folded = enc_folded.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(
        init_folded["params"]
    ) == jax.tree_util.tree_structure(folded_params)

    got = enc_folded.apply({"params": folded_params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_folded_full_detector_matches(tiny_spec):
    batch = tiny_batch(batch_size=1)
    model = MultiModal3DDetector(spec=tiny_spec)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["camera_imgs"],
        batch["lidar_points"],
        batch["radar_points"],
        train=False,
    )
    variables = _nontrivial_bn_stats(variables, jax.random.PRNGKey(3))
    want = model.apply(
        variables,
        batch["camera_imgs"],
        batch["lidar_points"],
        batch["radar_points"],
        train=False,
    )

    folded_vars = fold_camera_variables(variables)
    assert "camera_encoder" not in folded_vars["batch_stats"]
    model_folded = MultiModal3DDetector(spec=tiny_spec, fold_bn=True)
    got = model_folded.apply(
        folded_vars,
        batch["camera_imgs"],
        batch["lidar_points"],
        batch["radar_points"],
        train=False,
    )
    for key in ("heatmap", "offset", "size", "rot", "vel"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]),
            atol=2e-4, rtol=1e-3, err_msg=key,
        )


def test_engine_fold_bn_option(tiny_spec, tmp_path):
    """InferenceEngine(fold_bn=True) restores an unfolded checkpoint and
    serves the folded graph with identical detections."""
    import pathlib
    import yaml

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        TrainSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    model = MultiModal3DDetector(spec=tiny_spec)
    trainer = Trainer(model, TrainSpec(batch_size=1), CompatFlags())
    batch = tiny_batch(batch_size=1)
    trainer.init_state(batch)
    ckpt = str(tmp_path / "m.msgpack")
    trainer.save_checkpoint(ckpt, epoch=0)

    cfg = load_config(
        str(pathlib.Path(__file__).parents[1] / "configs" / "base.yaml")
    )
    cfg["model"]["camera_encoder"]["input_size"] = [32, 64]
    cfg["dataset"]["cameras"]["image_size"] = [32, 64]
    cfg["model"]["lidar_encoder"]["max_points"] = 256
    cfg["model"]["radar_encoder"]["max_points_per_sensor"] = 16

    sample = {k: v[0] for k, v in batch.items()}
    eng_plain = InferenceEngine(model_path=ckpt, config=cfg)
    eng_fold = InferenceEngine(model_path=ckpt, config=cfg, fold_bn=True)
    out_a = eng_plain.run_inference(sample, visualize=False)
    out_b = eng_fold.run_inference(sample, visualize=False)
    np.testing.assert_allclose(
        out_a["detections"]["scores"],
        out_b["detections"]["scores"],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        out_a["detections"]["boxes"],
        out_b["detections"]["boxes"],
        atol=1e-3,
    )
