from gaussianeditor_tpu.ops.render import RenderOutput, render
