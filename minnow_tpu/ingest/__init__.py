from . import lgadget2, rockstar, snapshot, text
