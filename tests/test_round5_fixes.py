"""Round-5 hardening regression tests (VERDICT r4 'Next round' + ADVICE)."""

from __future__ import annotations

import os

import pytest

from aggo_spark.session import _local_shuffle_width


class TestLocalShuffleWidth:
    """ADVICE r4 session.py:53 — master parsing for the shuffle default."""

    def test_explicit_thread_count_wins_over_env(self):
        assert _local_shuffle_width("local[4]") == 4
        assert _local_shuffle_width("local[17]") == 17

    def test_star_and_bare_local_use_cpu_count(self):
        assert _local_shuffle_width("local[*]") == os.cpu_count()
        assert _local_shuffle_width("local") == os.cpu_count()

    @pytest.mark.parametrize("master", [
        "local-cluster[2,1,1024]",   # multi-JVM: box cores ≠ executor width
        "spark://host:7077",
        "yarn",
        "k8s://https://host:443",
        "local[4,2]",                # retry form: leave to cluster default
    ])
    def test_non_plain_local_masters_get_no_default(self, master):
        assert _local_shuffle_width(master) is None
