"""Device-side ops. Import submodules directly for the heavy ones; the most
common symbols are re-exported here."""

from detzero_tpu.ops.box_ops import (
    boxes_to_corners_3d, boxes_to_corners_bev, boxes3d_to_bev, enlarge_box3d,
    limit_period, points_in_boxes, rotate_points_along_z, transform_boxes3d,
)
from detzero_tpu.ops.iou3d import (
    boxes_giou3d, boxes_iou3d, boxes_iou3d_pairwise, boxes_iou_bev,
    boxes_overlap_bev,
)
from detzero_tpu.ops.nms import multi_class_nms, nms_bev
from detzero_tpu.ops.voxelize import dynamic_voxelize, scatter_to_dense_bev
