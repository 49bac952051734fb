from detzero_tpu.models.refining.grm import GeometryTransformer, grm_decode, grm_loss
from detzero_tpu.models.refining.prm import PositionTransformer, prm_decode, prm_loss
from detzero_tpu.models.refining.crm import ConfidencePointNet, crm_decode, crm_loss
