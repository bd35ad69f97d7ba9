import sys
sys.path.insert(0, "/root/repo")
from tools.quality_matrix import run

# over-parameterization test: finest level capped at image bandwidth
run("packed", 131072, steps=3000, k_samples=64, log2_size=16,
    test_views=4, max_res=256)
