from .trainer import Trainer, test
from .adversarial import AdversarialTrainer, AdversarialOptimizer
