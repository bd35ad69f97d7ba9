import sys
sys.path.insert(0, "/root/repo")
from tools.quality_matrix import run

# A: f32 compute, budget on
run("packed", 131072, steps=2000, k_samples=64, log2_size=16,
    test_views=2, dtype="float32")
# B: bf16, budget OFF
run("packed", 0, steps=2000, k_samples=64, log2_size=16, test_views=2)
