"""bench.py configuration auto-selection (no devices needed).

The benchmark races stream-shape x transport candidates with
interleaved probe medians (bench._select_config); these tests pin the
selection/pinning semantics with stub pass functions so a regression
cannot silently change what the driver's round-end bench measures.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _stub(t):
    def fn(images, settings, warm=True):
        return t, ["blob"], ["pix"]

    return fn


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("AKO_BENCH_MODE", raising=False)
    monkeypatch.delenv("AKO_TPU_TRANSPORT", raising=False)


def test_candidates_unpinned_races_all_four():
    names = [c[0] for c in bench._candidates()]
    assert names == [
        "seq+raw",
        "roundtrip+raw",
        "seq+transport",
        "roundtrip+transport",
    ]


def test_candidates_pinning(monkeypatch):
    monkeypatch.setenv("AKO_BENCH_MODE", "roundtrip")
    assert [c[0] for c in bench._candidates()] == [
        "roundtrip+raw",
        "roundtrip+transport",
    ]
    monkeypatch.setenv("AKO_TPU_TRANSPORT", "1")
    assert [c[0] for c in bench._candidates()] == ["roundtrip+transport"]
    monkeypatch.setenv("AKO_BENCH_MODE", "seq")
    monkeypatch.setenv("AKO_TPU_TRANSPORT", "0")
    assert [c[0] for c in bench._candidates()] == ["seq+raw"]


def test_select_config_picks_fastest_median(monkeypatch):
    monkeypatch.setattr(bench, "bench_ours", _stub(9.0))
    cands = [
        ("seq+raw", _stub(9.0), False),
        ("roundtrip+raw", _stub(3.0), False),
        ("seq+transport", _stub(8.0), True),
        ("roundtrip+transport", _stub(4.0), True),
    ]
    name, fn, transport = bench._select_config(cands, [], None)
    assert (name, transport) == ("roundtrip+raw", False)


def test_select_config_sets_transport_env(monkeypatch):
    seen = []

    def spy(images, settings, warm=True):
        seen.append(os.environ.get("AKO_TPU_TRANSPORT"))
        return 1.0, [], []

    monkeypatch.setattr(bench, "bench_ours", spy)
    cands = [("seq+raw", spy, False), ("seq+transport", spy, True)]
    bench._select_config(cands, [], None)
    # warm passes one per transport setting, then 3 interleaved rounds
    assert seen[:2] == ["0", "1"]
    assert seen[2:] == ["0", "1"] * bench.PROBE_ROUNDS


def test_select_config_single_candidate_warms_only(monkeypatch):
    calls = []

    def spy(images, settings, warm=True):
        calls.append(1)
        return 1.0, [], []

    monkeypatch.setattr(bench, "bench_ours", spy)
    name, fn, transport = bench._select_config([("seq+raw", spy, False)], [], None)
    assert name == "seq+raw" and len(calls) == 1
