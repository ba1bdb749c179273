import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import shutil, numpy as np, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import iseg_tpu.nn.norm as norm
norm.set_bn_momentum(0.9)
from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.checkpoint import ModelHelper
from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.evaluation import evaluate
from iseg_tpu.core.model import SegManaged, SegModelInferenceConfig
from iseg_tpu.core.optimizer import get_optimizer
from iseg_tpu.core.train import CoreTrain
from iseg_tpu.data import StandardAugmentationsPipeline
from iseg_tpu.nn import heads

shutil.rmtree("/tmp/verify_ckpt", ignore_errors=True)
env = common_env_setup(EnvConfig(random_seed=0))
print("mesh", env.mesh.shape, flush=True)
CROP, BATCH, NC = 32, 8, 3
model = SegManaged(num_class=NC,
    backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35,
                          include_top_conv=False),
    head=heads.SimpleDecoder(),
    )
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, CROP, CROP, 3)))
tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.2,
                      train_steps=100, warmup_steps=5)
pipe = StandardAugmentationsPipeline(training=True, crop_size=(CROP, CROP))
epipe = StandardAugmentationsPipeline(training=False, crop_size=(CROP, CROP))

def make(i):
    rng = np.random.RandomState(i)
    img = np.full((CROP + 8, CROP + 8, 3), 127.5, np.float32)
    img += rng.randn(*img.shape) * 4
    lab = np.zeros(img.shape[:2], np.int32)
    for k in range(1, NC):
        y, x = rng.randint(0, CROP, 2); s = rng.randint(8, 20)
        img[y:y+s, x:x+s] = 40 + (215 * k) // NC
        lab[y:y+s, x:x+s] = k
    return img, lab

def ds(epoch):
    for s in range(20):
        pairs = [pipe(*make(epoch*1000+s*BATCH+k), sample_index=s*BATCH+k) for k in range(BATCH)]
        yield {"image": np.stack([p[0] for p in pairs]), "label": np.stack([p[1] for p in pairs])}

def eds():
    for s in range(4):
        pairs = [epipe(*make(99000+s*BATCH+k)) for k in range(BATCH)]
        yield {"image": np.stack([p[0] for p in pairs]), "label": np.stack([p[1] for p in pairs])}

trainer = CoreTrain(env, model, tx, input_shape=(1, CROP, CROP, 3),
                    checkpoint_manager=ModelHelper("/tmp/verify_ckpt", max_to_keep=2), log_every=20)
trainer.restore()
trainer.train(ds, epochs=5, steps_per_epoch=20)
miou, _ = evaluate(env, model,
    {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
    eds(), inference_config=SegModelInferenceConfig(scale_rates=(0.75, 1.0), flip=True,
        sliding_window_crop_size=(24, 24)), verbose=False)
print("mIoU", miou, flush=True)
assert miou > 0.7, miou
t2 = CoreTrain(env, model, tx, input_shape=(1, CROP, CROP, 3),
               checkpoint_manager=ModelHelper("/tmp/verify_ckpt", max_to_keep=2))
t2.restore()
assert int(t2.state.step) == 100, int(t2.state.step)
np.testing.assert_allclose(
    np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]),
    np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]))
print("restore OK step", int(t2.state.step), flush=True)
print("VERIFY_E2E_PASS", flush=True)
