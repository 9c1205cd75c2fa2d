from .datatypes import BatchData, DetectionResults, Targets
from .config import Config, load_config, load_params
from .seeding import seed_everything
