"""Scene model subpackage."""
from . import surface, light, scene, loader, errors
