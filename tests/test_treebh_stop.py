"""TreeBH hierarchical FDR + stop-flag tests."""

import numpy as np

from legume_tpu.data.knowledge import Ontology
from legume_tpu.ops.enrichment import treebh
from legume_tpu.utils import stop


def _chain_ontology():
    return Ontology(
        terms={t: t for t in ["root", "a", "b", "a1", "a2", "b1"]},
        parents={
            "root": set(),
            "a": {"root"},
            "b": {"root"},
            "a1": {"a"},
            "a2": {"a"},
            "b1": {"b"},
        },
    )


def test_treebh_gates_children_on_parents():
    ont = _chain_ontology()
    p = {"root": 0.001, "a": 0.002, "b": 0.9, "a1": 0.003, "a2": 0.8, "b1": 0.001}
    q = treebh(p, ont, alpha=0.05)
    assert q["root"] < 0.05
    assert q["a"] < 0.05
    # b not rejected -> b1 never tested despite tiny p
    assert q["b"] > 0.05
    assert q["b1"] == 1.0
    assert q["a1"] < 0.05


def test_stop_flag_roundtrip():
    stop.reset()
    assert not stop.stop_requested()
    stop._stop.set()
    assert stop.stop_requested()
    stop.reset()
    assert not stop.stop_requested()
