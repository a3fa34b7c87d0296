"""Quiet-window gate logic in bench.py — pure logic tests (no Ray).

A gate regression silently corrupts a whole round's recorded numbers
(BENCH_r03 was 1.41x off because the ungated rep landed in a storm;
the first gated version then disqualified provably-quiet reps on its
own teardown), so the gating rules get the same test treatment as the
engine."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class TestDuringSampler:
    def _sampler_with(self, samples):
        s = bench._DuringSampler(period_s=999)
        s.samples = list(samples)
        return s

    def test_empty_is_ok(self):
        # short reps can end before the first sample: no evidence of a
        # storm is not evidence of one (pre-probe gates those reps)
        assert self._sampler_with([]).ok
        assert self._sampler_with([]).min_gbps is None

    def test_single_dip_tolerated(self):
        lo = bench.QUIET_DURING_GBPS / 2
        assert self._sampler_with([lo, 5.0, lo]).ok

    def test_sustained_dip_disqualifies(self):
        lo = bench.QUIET_DURING_GBPS / 2
        assert not self._sampler_with([5.0, lo, lo]).ok

    def test_min_gbps(self):
        assert self._sampler_with([3.0, 1.0, 2.0]).min_gbps == 1.0


class TestPostProbe:
    def test_returns_first_quiet_reading(self, monkeypatch):
        seq = iter([1.0, 2.0, bench.QUIET_GBPS + 1, 99.0])
        monkeypatch.setattr(bench, "bw_probe", lambda: next(seq))
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        # stops as soon as a reading clears the gate (never reaches 99)
        assert bench._post_probe() == bench.QUIET_GBPS + 1

    def test_all_contended_returns_max(self, monkeypatch):
        seq = iter([1.0, 2.5, 1.5, 2.0])
        monkeypatch.setattr(bench, "bw_probe", lambda: next(seq))
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        assert bench._post_probe(attempts=4) == 2.5

    def test_attempt_budget(self, monkeypatch):
        calls = []
        monkeypatch.setattr(bench, "bw_probe", lambda: calls.append(1) or 0.5)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        bench._post_probe(attempts=3)
        assert len(calls) == 3


class TestRepSelection:
    """The best-rep rule used by run_default and run_scaling: any
    qualifying rep beats any contended one; ties broken by metric."""

    def test_qualifying_beats_faster_contended(self):
        # mirrors the inline logic: replicate it on dicts
        reps = [
            {"window_ok": False, "value": 5.0},
            {"window_ok": True, "value": 7.0},
        ]
        best = None
        for out in reps:
            if best is None:
                best = out
            elif out["window_ok"] and not best["window_ok"]:
                best = out
            elif (out["window_ok"] == best["window_ok"]
                  and out["value"] < best["value"]):
                best = out
        assert best["value"] == 7.0 and best["window_ok"]
