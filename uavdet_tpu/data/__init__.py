from .antiuav import build_index, save_manifest, load_manifest
from .pipeline import DataPipeline, make_transform
from .synthetic import make_synthetic_dataset
