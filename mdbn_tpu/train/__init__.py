from .trainer import EpochMetrics, train_rbm
