"""Model zoo: thin classes reproducing the reference's public per-model API
(``Model(config, data_provider)``, ``train_one_epoch(lr)``, ``test_one_image(images)``,
``save_weight(mode, path)``, ``load_weight(path)``)."""

from tpudet.models.ssd import SSD300, SSD512  # noqa: F401
from tpudet.models.retinanet import RetinaNet  # noqa: F401
