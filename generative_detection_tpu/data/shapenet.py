"""ShapeNet dataset contract (legacy).

The reference ships a ShapeNet path (ref src/data/datasets/shapenet.py, 340
LoC over GET3D renders) that is *dead code*: it imports a module that does
not exist in the repo (``src.util.pose_transforms``, ref shapenet.py:16), so
it cannot run there either (SURVEY §2.1 "Dead/buggy code"). The class surface
is declared here as the extension contract; item keys match the nuScenes
patch contract so a working loader can drop into the same training stack.
"""

from __future__ import annotations


class ShapeNetBase:
    REQUIRED_ITEM_KEYS = (
        "patch",
        "class_id",
        "original_class_id",
        "class_name",
        "pose_6d",
        "bbox_sizes",
        "yaw",
        "fill_factor",
        "mask_2d_bbox",
    )

    def __init__(self, config=None, **kwargs):
        raise NotImplementedError(
            "The ShapeNet path is non-functional in the reference (missing "
            "src/util/pose_transforms.py, ref shapenet.py:16) and is kept "
            "here as a declared extension contract only."
        )


class ShapeNetTrain(ShapeNetBase):
    split = "train"


class ShapeNetValidation(ShapeNetBase):
    split = "validation"


class ShapeNetTest(ShapeNetBase):
    split = "test"
