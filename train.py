"""Main CLI entry: 3-stage multi-task training (reference: DG_VAE/train.py).

Stages (train.py:81-85): 100 epochs recon-only, 60 epochs recon+prob,
60 epochs all three losses, lr 1e-4, lr_step 50. ``--num_epochs`` is ignored
exactly like the reference (quirk 9). The dataset dir comes from --data_dir
(the reference hardcodes a cluster path, quirk 10); with no --data_dir a
synthetic labeled dataset is generated so the pipeline runs anywhere.
"""
from __future__ import annotations

import os

# the axon TPU plugin pins jax_platforms via jax config, so a plain
# JAX_PLATFORMS env var cannot force CPU; this knob can (used by the
# CPU-only quality runs, e.g. benchmarks/curriculum_parity.py)
if os.environ.get("MGVAE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MGVAE_PLATFORM"])

import numpy as np

from config import get_parse_args
import mgvae_tpu
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.parallel.mesh import maybe_initialize_distributed


def load_dataset(args):
    if args.data_dir:
        circuit_path = os.path.join(args.data_dir, "graphs.npz")
        label_filename = "graphs.npz" if args.type == "aig" else "labels.npz"
        label_path = os.path.join(args.data_dir, label_filename)
        parser = mgvae_tpu.NpzParser(args.data_dir, circuit_path, label_path, args.type, seed=args.seed)
        return parser.get_dataset()
    print(f"[INFO] --data_dir not set; generating {args.synthetic_circuits} synthetic {args.type} circuits")
    rng = np.random.default_rng(args.seed)
    graphs = [
        mgvae_tpu.random_circuit(
            rng, args.type, num_inputs=8, num_gates=120, num_tt_pairs=64, name=f"syn{i}"
        )
        for i in range(args.synthetic_circuits)
    ]
    cut = int(len(graphs) * 0.9)
    return graphs[:cut], graphs[cut:]


if __name__ == "__main__":
    args = get_parse_args()
    maybe_initialize_distributed()

    print("[INFO] Parse Dataset")
    train_dataset, val_dataset = load_dataset(args)

    print("[INFO] Create Model")
    cfg = DGConfig(
        modality=args.type,
        dim_hidden=args.dim_hidden,
        dim_feature=args.dim_feature,
        s_rounds=args.s_rounds,
        t_rounds=args.t_rounds,
        layernorm=args.layernorm,
        variational="VAE" in args.model,
        input_quirk=not args.no_input_quirk,
        neg_collision_mask=args.neg_collision_mask,
        matmul_precision=args.matmul_precision,
        # --model AE selects the 2-layer DirectedGCN encoder (train.py:51-54)
        struct_encoder="multigcn" if "DG" in args.model else "gcn",
    )

    trainer = mgvae_tpu.Trainer(
        args, cfg,
        training_id=args.exp_id,
        save_dir=args.save_dir,
        batch_size=args.batch_size,
        distributed=args.distributed,
        num_devices=args.num_devices or None,
        kl_weight=args.kl_weight,
        seed=args.seed,
        log_every=args.log_every,
        fixed_dims=not args.no_fixed_dims,
        steps_per_call=args.steps_per_call,
        split=args.split if args.split == "auto" else int(args.split),
    )
    if args.resume:
        trainer.resume()

    stage_epochs = [int(x) for x in args.stage_epochs.split(",")]
    stage_configs = [
        {"epochs": stage_epochs[0], "weights": [1.0, 0.0, 0.0], "lr": 1e-4},
        {"epochs": stage_epochs[1], "weights": [1.0, 5.0, 0.0], "lr": 1e-4},
        {"epochs": stage_epochs[2], "weights": [1.0, 4.0, 4.0], "lr": 1e-4},
    ]

    for stage_idx, config in enumerate(stage_configs):
        print(f"\n{'=' * 40}")
        print(f"[STAGE {stage_idx + 1}] Start Training")
        print(f"|-- Epochs: {config['epochs']}")
        print(f"|-- Loss Weights: {config['weights']}")
        print(f"|-- Learning Rate: {config['lr']}")
        trainer.set_training_args(
            rc_prob_func_weight=config["weights"], lr=config["lr"], lr_step=50
        )
        trainer.train(config["epochs"], train_dataset, val_dataset)
        trainer.save(os.path.join(trainer.log_dir, f"stage_{stage_idx + 1}.pth"))

    print("\n[INFO] All training stages completed!")
