from gaussianeditor_tpu.guidance.base import Guidance, GuidanceOutput, Segmentor
from gaussianeditor_tpu.guidance.fake import FakeGuidance, FakeSegmentor
