"""Config system: YAML round trip, membership, CLI override precedence."""

import pytest

from bbdm_tpu.config import (
    ConfigNode,
    apply_cli_overrides,
    dict2namespace,
    get_obj_from_str,
    instantiate_from_config,
    load_config,
    namespace2dict,
    save_config,
)


def test_dict_namespace_roundtrip():
    d = {"a": 1, "b": {"c": [1, 2], "d": "x"}, "e": (3, 4)}
    ns = dict2namespace(d)
    assert ns.a == 1 and ns.b.c == [1, 2] and ns.e == (3, 4)
    assert namespace2dict(ns) == d


def test_contains_and_get():
    ns = dict2namespace({"x": {"y": 1}})
    assert "x" in ns and "z" not in ns
    assert "y" in ns.x
    assert ns.get("z", 42) == 42


def test_yaml_python_tuple_tag(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: !!python/tuple\n  - 1\n  - 2\nb: 3\n")
    cfg = load_config(str(p))
    assert cfg.a == (1, 2) and cfg.b == 3


def test_template_configs_load():
    for name in ("Template-BBDM", "Template-LBBDM-f4", "Template-LBBDM-f8",
                 "Template-LBBDM-f16", "Template-VQGAN-f4"):
        cfg = load_config(f"configs/{name}.yaml")
        assert cfg.runner in ("BBDMRunner", "VQGANRunner")
        if name.startswith("Template-LBBDM"):
            assert cfg.model.model_type == "LBBDM"
            assert isinstance(cfg.model.BB.params.UNetParams.channel_mult, tuple)


def test_cli_overrides():
    cfg = dict2namespace({
        "training": {"n_epochs": 100, "n_steps": 1000},
        "model": {"model_load_path": None},
    })
    args = dict2namespace({
        "resume_model": "/x/model.ckpt", "resume_optim": None,
        "max_epoch": 5, "max_steps": None,
    })
    cfg = apply_cli_overrides(cfg, args)
    assert cfg.model.model_load_path == "/x/model.ckpt"
    assert cfg.training.n_epochs == 5
    assert cfg.training.n_steps == 1000  # untouched
    assert cfg.args is args


def test_save_config_snapshot(tmp_path):
    cfg = dict2namespace({"a": (1, 2), "b": {"c": 1.5}})
    p = tmp_path / "snap.yaml"
    save_config(cfg, str(p))
    import yaml

    loaded = yaml.safe_load(p.read_text())
    assert loaded == {"a": [1, 2], "b": {"c": 1.5}}


def test_instantiate_from_config():
    node = dict2namespace({"target": "collections.OrderedDict"})
    obj = instantiate_from_config(node)
    from collections import OrderedDict

    assert isinstance(obj, OrderedDict)
    assert get_obj_from_str("os.path.join").__name__ == "join"


def test_instantiate_requires_target():
    with pytest.raises(KeyError):
        instantiate_from_config(dict2namespace({"params": {}}))


@pytest.mark.slow
def test_template_models_build_and_shape_check():
    """Every shipped template instantiates through build_model, and the
    sampler's abstract output shape round-trips to the input image shape
    (eval_shape only — no compute; catches config-schema drift for f8/f16)."""
    import jax
    import jax.numpy as jnp

    from bbdm_tpu.models import build_model

    for name, size in (("Template-BBDM", 256), ("Template-LBBDM-f4", 256),
                       ("Template-LBBDM-f8", 256), ("Template-LBBDM-f16", 256)):
        cfg = load_config(f"configs/{name}.yaml")
        cfg.model.BB.params.sample_step = 4
        model = build_model(cfg.model)
        params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
        kw = {}
        if hasattr(model, "encode"):  # latent model takes stats
            kw["latent_stats"] = None
        out = jax.eval_shape(
            lambda p, r, x: model.sample(p, r, x, clip_denoised=False, **kw),
            params, jax.random.PRNGKey(1),
            jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32))
        assert out.shape == (1, size, size, 3), (name, out.shape)
