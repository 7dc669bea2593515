"""Model zoo: thin classes reproducing the reference's public per-model API
(``Model(config, data_provider)``, ``train_one_epoch(lr)``, ``test_one_image(images)``,
``save_weight(mode, path)``, ``load_weight(path)``, plus the per-model
``load_pretraining_weight`` / ``load_pretrained_weight`` hooks)."""

from tpudet.models.ssd import SSD300, SSD512  # noqa: F401
from tpudet.models.retinanet import RetinaNet  # noqa: F401
from tpudet.models.yolo import YOLOv2, YOLOv3  # noqa: F401
from tpudet.models.refinedet import RefineDet320, RefineDet, PFPNetR  # noqa: F401
from tpudet.models.centernet import CenterNet  # noqa: F401
from tpudet.models.fcos import FCOS  # noqa: F401
from tpudet.models.lhrcnn import LHRCNN  # noqa: F401

ALL_MODELS = {
    "SSD300": SSD300, "SSD512": SSD512, "YOLOv2": YOLOv2, "YOLOv3": YOLOv3,
    "RetinaNet": RetinaNet, "RefineDet320": RefineDet320, "PFPNetR": PFPNetR,
    "LHRCNN": LHRCNN, "CenterNet": CenterNet, "FCOS": FCOS,
}
