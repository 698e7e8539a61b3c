import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scail_tpu.utils.config import deep_merge, load_configs, split_reference_config, wrap
from scail_tpu.utils.registry import get_obj_from_str, instantiate_from_config, register
from scail_tpu.utils.misc import append_dims


def test_deep_merge_override():
    a = {"m": {"x": 1, "y": 2}, "k": 3}
    b = {"m": {"y": 5, "z": 6}}
    out = deep_merge(a, b)
    assert out == {"m": {"x": 1, "y": 5, "z": 6}, "k": 3}


def test_config_attr_access():
    cfg = wrap({"model": {"network_config": {"params": {"hidden_size": 64}}}})
    assert cfg.model.network_config.params.hidden_size == 64
    assert cfg.get("missing", None) is None


def test_load_and_split(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text("model:\n  scale_factor: 1.0\nargs:\n  batch_size: 1\n")
    p2 = tmp_path / "b.yaml"
    p2.write_text("args:\n  batch_size: 4\n")
    cfg = load_configs([str(p1), str(p2)])
    run, model = split_reference_config(cfg)
    assert run.batch_size == 4
    assert model.scale_factor == 1.0


def test_registry_alias_and_instantiate():
    @register(alias="ref.fake.Thing")
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = instantiate_from_config({"target": "ref.fake.Thing", "params": {"a": 1}})
    assert (obj.a, obj.b) == (1, 2)
    assert get_obj_from_str("ref.fake.Thing") is Thing


def test_append_dims():
    x = jnp.ones((3,))
    assert append_dims(x, 4).shape == (3, 1, 1, 1)


def test_mesh_spec():
    from scail_tpu.parallel import MeshSpec, make_mesh, mesh_axis_size

    assert jax.device_count() == 8
    spec = MeshSpec.infer(8, seq=2, model=2)
    assert (spec.data, spec.seq, spec.model) == (2, 2, 2)
    mesh = make_mesh(spec)
    assert mesh_axis_size("seq", mesh) == 2
    with pytest.raises(AssertionError):
        MeshSpec.infer(8, seq=3)


def test_shard_tree_rules():
    from jax.sharding import PartitionSpec as P

    from scail_tpu.parallel import PathRules, make_mesh, shard_tree, specs_for_tree

    mesh = make_mesh()
    tree = {"layers": {"qkv": {"w": np.zeros((4, 8, 16))}, "out": {"w": np.zeros((4, 16, 8))}}}
    rules = PathRules([
        (r"qkv/w$", P(None, None, "model")),
        (r"out/w$", P(None, "model", None)),
    ])
    specs = specs_for_tree(tree, rules)
    assert specs["layers"]["qkv"]["w"] == P(None, None, "model")
    sharded = shard_tree(tree, rules, mesh)
    assert sharded["layers"]["qkv"]["w"].sharding.spec == P(None, None, "model")
