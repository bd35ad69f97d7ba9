"""LeReS / cIMLE monocular-depth subsystem (flax, NHWC, TPU-native).

Rebuild of the reference's `AdelaiDepth/LeReS` subproject:

  backbones   ResNet-18/34/50/101/152 + ResNeXt101-32x8d lateral encoders,
              optional encoder-site AdaIN cIMLE injection
  decoder     FTB / ATA / FFM / AO top-down decoder, AuxiNetV2 disparity
              branch, decoder-site AdaIN (cimle v3..v6)
  model       DepthNet / init_depth_model / depth_inference
              (RelDepthModel.inference semantics) / AdaIN calibration
  losses      ILNR, MSGIL, edge-guided ranking, PWN-edges, PWN-planes,
              scale/shift recovery, LOSS_MODE orchestrator
  normals     surface normals from depth (PWN support)
  trainer     the cIMLE training loop (argmin-z recache), AdaIN-stat
              calibration, SGD + WarmupMultiStepLR
  optim       split-LR SGD groups + warmup-multistep schedule
  data        annotation-JSON multi-dataset loader + interleaving sampler
  config      two-tier DATASET/MODEL/TRAIN config with yaml merge
  weights     torch checkpoint (res101.pth / lpips) -> flax conversion
  metrics     absRel/squaRel/rms/silog/log10/delta/WHDR battery
  pointcloud  depth -> PLY reconstruction
  voxelnet    dense-voxel focal/shift refiner (SPVCNN-class equivalent)

CLIs: depth_train.py, depth_test.py, depth_eval.py, depth_eval_scannet.py
(repo root).
"""
