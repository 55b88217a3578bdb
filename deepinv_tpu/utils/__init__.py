from .logger import AverageMeter, ProgressMeter, CSVLogger
