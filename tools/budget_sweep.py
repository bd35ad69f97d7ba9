import sys
sys.path.insert(0, "/root/repo")
from tools.quality_matrix import run

run("packed", 131072, steps=1500, k_samples=64)
