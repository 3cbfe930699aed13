from . import native, serialize
