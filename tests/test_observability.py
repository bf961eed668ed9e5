"""Observability: counters, timers, metrics line emission."""

import io
import json

from rkmh_tpu import observability as obs


def test_counters_and_metrics_line(capsys):
    with obs.observed_run("testcmd", enabled=True):
        obs.count("reads", 100)
        obs.count("reads", 50)
        obs.count("bp", 9000)
        with obs.phase("hashing"):
            pass
    err = capsys.readouterr().err
    line = json.loads(err.strip().splitlines()[-1])
    assert line["command"] == "testcmd"
    assert line["reads"] == 150 and line["bp"] == 9000
    assert line["reads_per_sec"] > 0
    assert "t_hashing_s" in line


def test_disabled_emits_nothing(capsys):
    with obs.observed_run("quiet", enabled=False):
        obs.count("reads", 5)
    assert capsys.readouterr().err == ""


def test_counters_reset_between_runs(capsys):
    with obs.observed_run("a", enabled=True):
        obs.count("reads", 1)
    with obs.observed_run("b", enabled=True):
        pass
    lines = [json.loads(l) for l in capsys.readouterr().err.strip().splitlines()]
    assert lines[0]["reads"] == 1
    assert "reads" not in lines[1]


def test_resolve_batch_size():
    from rkmh_tpu.commands.common import DEFAULT_BATCH, resolve_batch_size

    assert resolve_batch_size(512) == 512
    auto = resolve_batch_size(0)
    assert auto in (DEFAULT_BATCH, 16384)
