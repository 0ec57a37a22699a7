from coarse3d_tpu.utils.meters import AverageMeter, RemainTime, RunningAvgMeter
from coarse3d_tpu.utils.recorder import Recorder

__all__ = ["AverageMeter", "RemainTime", "RunningAvgMeter", "Recorder"]
