"""Observability layer: SmoothedValue, TrainingStats, ScalarLogger."""
import json
import os

from google_nerf_tpu.utils.logging import (ScalarLogger, SmoothedValue,
                                           TrainingStats)


def test_smoothed_value_median_and_avg():
    s = SmoothedValue(window_size=3)
    for v in (1.0, 100.0, 2.0, 3.0):
        s.update(v)
    assert s.median == 3.0          # window is [100, 2, 3] -> sorted mid
    assert s.avg == (100 + 2 + 3) / 3
    assert s.global_avg == (1 + 100 + 2 + 3) / 4
    assert s.count == 4


def test_training_stats_eta_and_log(tmp_path):
    logger = ScalarLogger(str(tmp_path))
    st = TrainingStats(total_iters=100, log_interval=10, logger=logger)
    lines = []
    for i in range(1, 21):
        st.iter_tic()
        st.update({"loss": 1.0 / i})
        st.iter_toc()
        st.log_iter_stats(i, print_fn=lines.append)
    assert len(lines) == 2          # iters 10 and 20
    assert "loss=" in lines[0] and "eta" in lines[0]
    assert st.eta_seconds(100) == 0.0
    logger.close()
    jsonl = os.path.join(str(tmp_path), "scalars.jsonl")
    recs = [json.loads(l) for l in open(jsonl)]
    assert recs[0]["step"] == 10
    assert "loss" in recs[0]


def test_scalar_logger_rank_gated(tmp_path):
    logger = ScalarLogger(str(tmp_path / "r1"), rank=1)
    logger.log(1, {"x": 1.0})
    logger.close()
    assert not os.path.exists(str(tmp_path / "r1"))
