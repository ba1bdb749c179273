"""CoreTrain + fused device augmentation integration."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.model import SegManaged
from iseg_tpu.core.optimizer import get_optimizer
from iseg_tpu.core.train import CoreTrain
from iseg_tpu.data.device_augment import DeviceAugmentConfig, make_device_augment
from iseg_tpu.nn.heads import SimpleDecoder


def test_train_with_device_augment():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01,
                          train_steps=4)

    aug = make_device_augment(DeviceAugmentConfig(
        crop_size=(32, 32), min_scale_factor=0.75, max_scale_factor=1.25))

    trainer = CoreTrain(env, model, tx, input_shape=(1, 32, 32, 3),
                        log_every=0, device_augment=aug)

    def ds(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(2):
            # raw (pre-augment) images are larger than the crop
            yield {
                "image": rng.rand(8, 48, 48, 3).astype(np.float32) * 255,
                "label": rng.randint(0, 3, (8, 48, 48)).astype(np.int32),
            }

    history = trainer.train(ds, epochs=1)
    assert history[0]["steps"] == 2
    assert np.isfinite(history[0]["loss"])
