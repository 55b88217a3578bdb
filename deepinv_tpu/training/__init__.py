from .trainer import Trainer, test
