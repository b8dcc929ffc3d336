from . import minh
