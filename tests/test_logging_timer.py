"""Logging subsystem and timer registry tests (reference: HighsIO
semantics, util/HighsTimer.h)."""
import time

import numpy as np

from highs_tpu import Highs
from highs_tpu.io.logging import HighsLogger, HighsLogType
from highs_tpu.options import HighsOptions
from highs_tpu.utils.timer import HighsTimer

from conftest import instance_path


def test_logger_levels_and_callback():
    opts = HighsOptions()
    opts.log_to_console = False
    logger = HighsLogger(opts)
    seen = []
    logger.set_callback(lambda t, m: seen.append((t, m)))
    logger.info("hello")
    logger.warning("careful")
    logger.error("boom")
    assert [t for t, _ in seen] == [1, 4, 5]
    assert seen[1][1].startswith("WARNING:")
    assert seen[2][1].startswith("ERROR:")


def test_logger_output_flag_silences():
    opts = HighsOptions()
    opts.output_flag = False
    logger = HighsLogger(opts)
    seen = []
    logger.set_callback(lambda t, m: seen.append(m))
    logger.info("quiet")
    assert seen == []


def test_logger_dev_level_gating():
    opts = HighsOptions()
    opts.log_to_console = False
    logger = HighsLogger(opts)
    seen = []
    logger.set_callback(lambda t, m: seen.append(m))
    logger.dev(1, "dev1")
    assert seen == []  # log_dev_level 0
    opts.log_dev_level = 2
    logger.dev(1, "dev1")
    logger.dev(2, "dev2")
    logger.dev(3, "dev3")
    assert seen == ["dev1", "dev2"]


def test_logger_timeless_scrubs_times():
    opts = HighsOptions()
    opts.log_to_console = False
    opts.timeless_log = True
    logger = HighsLogger(opts)
    seen = []
    logger.set_callback(lambda t, m: seen.append(m))
    logger.info("run time 12.34 and 0.56 seconds")
    assert seen == ["run time t.tt and t.tt seconds"]


def test_log_file(tmp_path):
    path = str(tmp_path / "solve.log")
    h = Highs()
    h.setOptionValue("log_to_console", False)
    h.setOptionValue("log_file", path)
    h.readModel(instance_path("afiro.mps"))
    h.setOptionValue("solver", "simplex")
    h.run()
    h.reportSolvedStats()
    text = open(path).read()
    assert "Model status" in text
    assert "Optimal" in text


def test_timer_named_clocks():
    t = HighsTimer()
    t.start("a")
    time.sleep(0.01)
    t.stop("a")
    with t.scope("b"):
        time.sleep(0.005)
    assert t.read("a") >= 0.009
    assert t.read("b") >= 0.004
    assert t.num_calls("a") == 1
    rep = t.report()
    assert any("a" in line for line in rep)
    assert rep[0].startswith("Clock")


def test_run_records_phase_clocks():
    h = Highs()
    h.setOptionValue("output_flag", False)
    h.setOptionValue("solver", "simplex")
    h.readModel(instance_path("afiro.mps"))
    h.run()
    timer = h.getTimer()
    assert timer.read("run") > 0
    assert timer.read("solve") > 0
    assert timer.num_calls("presolve") >= 1
