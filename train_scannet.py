"""ScanNet training CLI — parity with reference `ngp_pl/train_scannet.py`:
identical to train.py but passes the ScanNet dataset kwargs
(test_skip/rot_transpose/scale_flip), honors --num_levels, wires depth-prior
supervision (--depth_loss_w/--depth_dir), and always writes the test video at
fps=5 (`train_scannet.py:293-299`).
"""
from __future__ import annotations

import sys

from opt import get_opts
from train import main, save_videos


def run(argv=None):
    hparams = get_opts(argv)
    hparams.dataset_name = 'scannet'
    logs = main(hparams, video_fps=5)
    if not hparams.no_save_test and not hparams.val_only:
        import os
        val_dir = os.path.abspath(f'results/scannet/{hparams.exp_name}')
        save_videos(val_dir, fps=5)
    return logs


if __name__ == '__main__':
    run(sys.argv[1:])
