"""Tests for the scheduler / executor / backend seam."""
import threading
import time

import numpy as np
import pytest

from paramugsy_tpu.runtime.scheduler import PriorityScheduler, spawn
from paramugsy_tpu.runtime.backends import LocalBackend, RecordingBackend, RetryBackend
from paramugsy_tpu.runtime.executor import JobExecutor
from paramugsy_tpu.pipeline import Aligner, Genome, PipelineConfig


class TestScheduler:
    def test_basic(self):
        s = PriorityScheduler(2)
        futs = [s.submit(lambda i=i: i * i, priority=0) for i in range(10)]
        assert [f.result(5) for f in futs] == [i * i for i in range(10)]
        s.stop()

    def test_priority_order(self):
        s = PriorityScheduler(1)
        order = []
        gate = threading.Event()
        s.submit(lambda: gate.wait(5))  # occupy the only slot
        futs = [
            s.submit(lambda p=p: order.append(p), priority=p, name=str(p))
            for p in [1, 5, 3, 9, 2]
        ]
        gate.set()
        for f in futs:
            f.result(5)
        assert order == [9, 5, 3, 2, 1]
        s.stop()

    def test_exception_propagates(self):
        s = PriorityScheduler(1)

        def boom():
            raise ValueError("x")

        with pytest.raises(ValueError):
            s.submit(boom).result(5)
        s.stop()

    def test_spawn(self):
        assert spawn(lambda: 42).result(5) == 42


class TestBackends:
    def test_retry_eventually_succeeds(self):
        inner = LocalBackend(1)
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("transient")
            return "ok"

        b = RetryBackend(inner, retries=5, backoff_s=0.01)
        assert b.submit(flaky).result(10) == "ok"
        assert len(attempts) == 3
        b.stop()

    def test_retry_exhausts(self):
        b = RetryBackend(LocalBackend(1), retries=2, backoff_s=0.01)

        def always():
            raise RuntimeError("permanent")

        with pytest.raises(RuntimeError):
            b.submit(always).result(10)
        b.stop()

    def test_recording(self):
        rec = RecordingBackend(LocalBackend(1))
        rec.submit(lambda: 1, name="a", priority=2).result(5)
        rec.submit(lambda: 2, name="b", priority=1).result(5)
        assert rec.submissions == [("a", 2), ("b", 1)]
        assert sorted(rec.completed) == ["a", "b"]
        rec.stop()


def _mk_genomes(seed=11, n=3000, count=4):
    rng = np.random.default_rng(seed)
    anc = "".join(np.array(list("ACGT"))[rng.integers(4, size=n)])
    genomes = []
    for i in range(count):
        s = list(anc)
        for j in rng.choice(n, n // 50, replace=False):
            s[j] = "ACGT"[rng.integers(4)]
        genomes.append(Genome(name=f"g{i}", seqs={f"g{i}.chr": "".join(s)}))
    return genomes


class TestExecutor:
    def test_concurrent_matches_sequential(self):
        genomes = _mk_genomes()
        cfg = PipelineConfig()
        seq = Aligner(genomes, cfg)
        tree = seq.job_tree()
        seq_blocks = seq.run_node(tree)

        ex = JobExecutor(_mk_genomes(), PipelineConfig(), run_size=4, chunk_size=2)
        conc_blocks = ex.execute(tree)

        # Same alignment content: compare (name, start, size, strand) row sets
        def rows(blocks):
            return sorted(
                (s.name, s.start, s.size, s.strand, s.text)
                for b in blocks
                for s in b.seqs
            )

        assert rows(seq_blocks) == rows(conc_blocks)

    def test_failure_aborts(self):
        genomes = _mk_genomes(count=2)
        cfg = PipelineConfig()
        ex = JobExecutor(genomes, cfg, run_size=2)
        tree = Aligner(genomes, cfg).job_tree()

        def boom(*a, **k):
            raise RuntimeError("injected fault")

        ex._pair_chunk_task = boom
        with pytest.raises(RuntimeError, match="injected fault"):
            ex.execute(tree)


class TestObs:
    def test_memory_monitor(self):
        from paramugsy_tpu.utils.obs import MemoryMonitor

        mon = MemoryMonitor(interval_s=0.05).start()
        x = bytearray(10 * 1024 * 1024)  # 10MB
        time.sleep(0.2)
        peak = mon.stop()
        assert peak > 10 * 1024  # at least 10MB RSS
        del x

    def test_metrics_phases(self):
        from paramugsy_tpu.utils.obs import Metrics

        m = Metrics()
        with m.phase("align", items=5):
            pass
        with m.phase("align", items=3):
            pass
        assert m.phases["align"].count == 2
        assert m.phases["align"].total_items == 8
        assert "align" in m.report()


class TestConfigFile:
    def test_load_config(self, tmp_path):
        import json

        from paramugsy_tpu.pipeline import load_config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({
            "min_length": 50,
            "emit_unique": False,
            "align": {"k": 14, "break_len": 300, "scoring": {"match": 3}},
        }))
        cfg = load_config(str(p))
        assert cfg.min_length == 50 and not cfg.emit_unique
        assert cfg.align.k == 14 and cfg.align.break_len == 300
        assert cfg.align.scoring.match == 3

    def test_unknown_key_rejected(self, tmp_path):
        import json

        from paramugsy_tpu.pipeline import load_config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"not_a_field": 1}))
        with pytest.raises(ValueError):
            load_config(str(p))


class TestTrace:
    def test_trace_events_written(self, tmp_path):
        import json

        from paramugsy_tpu.utils.obs import TRACE, METRICS

        TRACE.enable()
        try:
            with METRICS.phase("unit-test-phase"):
                pass
            TRACE.instant("unit-test-marker")
            out = tmp_path / "trace.json"
            TRACE.save(str(out))
            data = json.loads(out.read_text())
            names = [e["name"] for e in data["traceEvents"]]
            assert "unit-test-phase" in names
            assert "unit-test-marker" in names
            x = next(e for e in data["traceEvents"] if e["name"] == "unit-test-phase")
            assert x["ph"] == "X" and "dur" in x and "tid" in x
        finally:
            TRACE.enabled = False
