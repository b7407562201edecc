import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import make_scene, probe_budget, measure
from gaussianeditor_tpu.core.cameras import lookat_camera
hw = 512
cam = lookat_camera(np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.8, 0.8, hw, hw)
scene = make_scene(100_000)
nr, mi = probe_budget(scene, cam)
m = measure(scene, cam, hw, mi)
print(f"100k: {m:.3f} Mpix/s ({hw*hw/m/1000:.2f} ms)")
