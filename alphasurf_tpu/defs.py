"""Constants shared across the framework.

Mirrors the enum values of the reference implementation
(/root/reference/svox2/defs.py:1-17 and csrc/include/data_spec.hpp:8-37) so
checkpoints and configs are interchangeable.
"""

# Basis types
BASIS_TYPE_SH = 1
BASIS_TYPE_3D_TEXTURE = 4
BASIS_TYPE_MLP = 255

# Surface types
SURFACE_TYPE_NONE = 100
SURFACE_TYPE_PLANE = 101
SURFACE_TYPE_SDF = 102
SURFACE_TYPE_UDF = 103
SURFACE_TYPE_UDF_ALPHA = 104
SURFACE_TYPE_UDF_FAKE_SAMPLE = 105
SURFACE_TYPE_VOXEL_FACE = 106

SURFACE_TYPE_STRS = {
    "none": SURFACE_TYPE_NONE,
    "plane": SURFACE_TYPE_PLANE,
    "sdf": SURFACE_TYPE_SDF,
    "udf": SURFACE_TYPE_UDF,
    "udf_alpha": SURFACE_TYPE_UDF_ALPHA,
    "udf_fake_sample": SURFACE_TYPE_UDF_FAKE_SAMPLE,
    "voxel_face": SURFACE_TYPE_VOXEL_FACE,
}

# Alpha activation functions (data_spec.hpp: SIGMOID_FN=0, EXP_FN=1)
SIGMOID_FN = 0
EXP_FN = 1

MAX_SH_BASIS = 10
