"""Profiling utilities and distributed glue."""

import io
import re
import sys

import numpy as np

from libldpc_tpu.utils.profiling import ThroughputMeter, time_prof


class TestTimeProf:
    def test_prints_timeprof_line(self, capsys):
        with time_prof("unit-test", "us"):
            sum(range(1000))
        out = capsys.readouterr().out
        assert re.match(r"\[TIMEPROF\]: unit-test: [\d.]+ us", out)

    def test_unknown_unit_falls_back_to_ns(self, capsys):
        with time_prof("x", "parsecs"):
            pass
        assert "ns" in capsys.readouterr().out


class TestThroughputMeter:
    def test_frames_per_s(self):
        m = ThroughputMeter(bits_per_frame=1024)
        with m.batch(100):
            pass
        assert m.frames == 100
        assert m.frames_per_s > 0
        assert m.mbits_per_s > 0
        assert "frames/s" in m.summary()

    def test_overhead_subtraction(self):
        import time

        m = ThroughputMeter()
        m.measure_overhead(lambda: time.sleep(0.001), repeats=2)
        assert m.const_overhead > 0
        with m.batch(10):
            time.sleep(0.005)
        assert m.net_elapsed < m.elapsed


class TestDistributed:
    def test_single_process_info(self):
        from libldpc_tpu.parallel import distributed

        distributed.initialize()
        info = distributed.process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] >= 1
        assert distributed.is_primary()

    def test_global_mesh(self):
        from libldpc_tpu.parallel import distributed
        from libldpc_tpu.parallel.mesh import FRAME_AXIS

        mesh = distributed.global_mesh()
        assert FRAME_AXIS in mesh.axis_names
        assert mesh.devices.size == 8  # virtual CPU mesh


class TestAnnotations:
    def test_public_annotations_resolve_at_runtime(self):
        """`from __future__ import annotations` hides a missing typing
        import until something calls ``typing.get_type_hints`` (regression:
        ``ops/bec.py`` used ``Optional`` without importing it).  Resolve the
        hints of every public function in the core op/model modules."""
        import inspect
        import typing

        from libldpc_tpu.ops import bec, bec_sorted, channel, decoder, sorted as sorted_mod, streaming
        from libldpc_tpu.models import code as code_mod, io as io_mod
        from libldpc_tpu.sim import driver as driver_mod

        for mod in (bec, bec_sorted, channel, decoder, sorted_mod,
                    streaming, code_mod, io_mod, driver_mod):
            for name, fn in inspect.getmembers(mod, inspect.isfunction):
                if fn.__module__ != mod.__name__ or name.startswith("_"):
                    continue
                typing.get_type_hints(fn)  # raises NameError on a bad hint
