from .trainer import Trainer, make_mesh
