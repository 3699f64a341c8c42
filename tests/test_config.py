"""Config tree: round trip, overrides, model factory."""

import json

from nbody_tpu.config import ExperimentConfig
from nbody_tpu.models import ContinuousConvModel, GraphModel


def test_roundtrip(tmp_path):
    cfg = ExperimentConfig(name="x")
    p = tmp_path / "c.json"
    cfg.save(str(p))
    back = ExperimentConfig.load(str(p))
    assert back.to_dict() == cfg.to_dict()


def test_overrides():
    cfg = ExperimentConfig()
    out = cfg.apply_overrides(
        ["train.epochs=7", "model.type=contconv",
         'model.kwargs.filter_resolution=[6,4]', "datagen.n_bodies=[8]",
         "name=abc"]
    )
    assert out.train.epochs == 7
    assert out.model.type == "contconv"
    assert out.model.kwargs["filter_resolution"] == [6, 4]
    assert out.datagen.n_bodies == [8]
    assert out.name == "abc"
    # original untouched
    assert cfg.train.epochs == 100


def test_build_model_and_scenarios():
    cfg = ExperimentConfig().apply_overrides(
        ["model.type=gnn", "model.kwargs.gnn_dim=32",
         "model.kwargs.neighbors=5", "datagen.n_bodies=[4,6]",
         "datagen.steps=3"]
    )
    m = cfg.build_model()
    assert isinstance(m, GraphModel) and m.gnn_dim == 32 and m.neighbors == 5

    scenarios = cfg.scenarios(seed=1)
    assert len(scenarios) == 2
    assert {s.n_bodies for s in scenarios} == {4, 6}
    assert all(s.steps == 3 and s.seed == 1 for s in scenarios)

    cfg2 = cfg.apply_overrides(
        ["model.type=contconv", 'model.kwargs={"filter_resolution": [4], "radius": 1.0}']
    )
    m2 = cfg2.build_model()
    assert isinstance(m2, ContinuousConvModel)
    assert m2.filter_resolution == (4,)  # list -> tuple for hashability
