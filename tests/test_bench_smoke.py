"""Smoke tests for bench.py's CONTROL FLOW (VERDICT r4 weak #1 / next #1b).

Round 3's artifact died to tier ordering + timeout; round 4's to a TypeError
on the k=15 call that no test had ever executed. These tests run
`bench.main()` end-to-end with every heavy tier stubbed, so every branch —
budget skip, k=15 label path, attestation, headline re-emit and its
fallback — executes under pytest before it can ever reach the driver.
"""

import importlib
import json

import pytest


@pytest.fixture()
def bench(monkeypatch):
    mod = importlib.import_module("bench")
    # fresh emission record per test
    monkeypatch.setattr(mod, "_EMITTED", [])
    return mod


def _stub_tiers(monkeypatch, bench, calls, *, tier1_ok=True, tier1b_ok=True):
    def tier1(k, label="action"):
        calls.append(("tier1", k, label))
        if not tier1_ok:
            return False
        bench._emit(f"{label}_proofs_per_sec", 0.5, "proofs/s", 1.8)
        bench._emit(f"{label}_verifies_per_sec", 40.0, "verifies/s", 1.45)
        bench._emit(f"{label}_batch_verifies_per_sec", 110.0, "verifies/s", 4.0)
        return True

    def tier1b(k, B=8):
        calls.append(("tier1b", k, B))
        if not tier1b_ok:
            return False
        bench._emit("action_batched_proofs_per_sec", 0.6, "proofs/s", 2.2)
        return True

    def tier2(k=13):
        calls.append(("tier2", k))
        bench._emit("action_proof_kernel_equiv_per_sec", 1.0, "equiv-proofs/s", 3.6)
        return True

    def attest(subset=""):
        calls.append(("attest", subset))
        bench._emit("tpu_kernel_tier_green", 1.0, "bool", 1.0)
        return True

    monkeypatch.setattr(bench, "tier1_full_proof", tier1)
    monkeypatch.setattr(bench, "tier1b_batched", tier1b)
    monkeypatch.setattr(bench, "tier2_kernel_composite", tier2)
    monkeypatch.setattr(bench, "tier3_poseidon", lambda: calls.append(("tier3",)) or True)
    monkeypatch.setattr(bench, "attest_tpu_kernel_tier", attest)


def _emitted_lines(capsys):
    out = capsys.readouterr().out
    return [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]


def test_full_flow_runs_every_tier(bench, monkeypatch, capsys):
    calls = []
    _stub_tiers(monkeypatch, bench, calls)
    monkeypatch.setenv("TAIGA_BENCH_TOTAL", "100000")
    monkeypatch.delenv("TAIGA_BENCH_K15", raising=False)
    monkeypatch.delenv("TAIGA_BENCH_K", raising=False)
    monkeypatch.delenv("TAIGA_BENCH_TIER", raising=False)
    bench.main()
    names = [c[0] for c in calls]
    assert names.count("tier1") == 2, calls  # k=13 run + k=15 run
    # the k=15 invocation carries the label kwarg (the r4 crash site)
    assert ("tier1", 15, "action_k15") in calls
    assert ("tier1", 13, "action") in calls
    assert "tier1b" in names and "attest" in names
    lines = _emitted_lines(capsys)
    # headline re-emit: last line is the batched metric, tagged
    assert lines[-1]["metric"] == "action_batched_proofs_per_sec"
    assert lines[-1].get("headline") is True
    # k=15 lines made it out
    assert any(l["metric"] == "action_k15_proofs_per_sec" for l in lines)
    assert any(l["metric"] == "tpu_kernel_tier_green" for l in lines)


def test_headline_fallback_when_batched_fails(bench, monkeypatch, capsys):
    calls = []
    _stub_tiers(monkeypatch, bench, calls, tier1b_ok=False)
    monkeypatch.setenv("TAIGA_BENCH_TOTAL", "100000")
    monkeypatch.setenv("TAIGA_BENCH_K15", "0")
    bench.main()
    lines = _emitted_lines(capsys)
    assert lines, "no JSON lines emitted"
    # fallback: single-proof line re-emitted last (ADVICE r4 #1)
    assert lines[-1]["metric"] == "action_proofs_per_sec"
    assert lines[-1].get("headline") is True


def test_exhausted_budget_skips_optional_tiers(bench, monkeypatch, capsys):
    calls = []
    _stub_tiers(monkeypatch, bench, calls)
    # deadline already passed when the optional tiers are reached
    monkeypatch.setenv("TAIGA_BENCH_TOTAL", "0")
    monkeypatch.delenv("TAIGA_BENCH_K15", raising=False)
    bench.main()
    # core tiers still ran; optional (k15, attestation) skipped
    assert ("tier1", 13, "action") in calls
    assert ("tier1", 15, "action_k15") not in calls
    assert not any(c[0] == "attest" for c in calls)
    lines = _emitted_lines(capsys)
    assert lines[-1]["metric"] == "action_batched_proofs_per_sec"


def test_single_tier_env_dispatch(bench, monkeypatch, capsys):
    calls = []
    _stub_tiers(monkeypatch, bench, calls)
    monkeypatch.setenv("TAIGA_BENCH_TIER", "1b")
    monkeypatch.setenv("TAIGA_BENCH_K", "13")
    bench.main()
    assert calls == [("tier1b", 13, 8)]


def test_with_budget_timeout_keeps_benching(bench):
    import time

    def slow():
        time.sleep(5)
        return True

    t0 = time.time()
    out = bench._with_budget(1, "slow tier", slow)
    assert out is False
    assert time.time() - t0 < 3
