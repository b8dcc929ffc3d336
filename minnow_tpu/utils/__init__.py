from . import config, name_index
