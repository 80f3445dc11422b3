"""dggrid4py_ray — Ray-Data-native DGGS spatial + training-data engine."""

from . import _raypatch

# Ray 2.49 empty-block schema-leak workaround (see _raypatch docstring):
# typed 0-row batches run through map_batches UDFs so empty datasets keep
# evolving their schema; joins over legitimately-empty inputs then work.
RAY_EMPTY_BLOCK_PATCH_ACTIVE = _raypatch.install()
