from .trainer import Trainer, test
from .checkpoint import OrbaxCheckpointer
from .adversarial import AdversarialTrainer, AdversarialOptimizer


def train(model, physics, train_dataloader, epochs: int = 100, **kwargs):
    """Functional training entry point (reference deepinv.train): builds a
    :class:`Trainer` and runs it, returning the trained model."""
    t = Trainer(model, physics, train_dataloader=train_dataloader,
                epochs=epochs, **kwargs)
    t.train()
    return t.model
