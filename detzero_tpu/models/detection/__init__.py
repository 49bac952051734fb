from detzero_tpu.models.detection.centerpoint import CenterPoint, CenterPointNet
