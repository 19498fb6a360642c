from . import pytrees
