from . import bitpack, codec
