"""Multimodal DBN: per-modality towers + joint top RBM (SURVEY.md §3.3).

``train({modality: matrix})`` trains one DBN tower per modality (greedy,
independent — towers could run concurrently; kept sequential for determinism),
concatenates the towers' top-layer mean-field codes, and trains a joint
Bernoulli RBM on the concatenation. ``transform`` produces the joint latent
code used downstream for k-means patient clustering (BASELINE.json configs
4-5).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import MDBNConfig, TrainRuntimeConfig
from .dbn import DBN
from .rbm import RBM


class MDBN:
    """>>> mdbn = MDBN(MDBNConfig(towers={...}, joint=RBMConfig(...)))
    >>> mdbn.train({"ge": ge, "meth": meth, "mirna": mirna})
    >>> joint_codes = mdbn.transform(modalities)
    """

    def __init__(self, cfg: MDBNConfig):
        self.cfg = cfg
        self.towers: Dict[str, DBN] = {}
        self.joint: Optional[RBM] = None

    def _tower_codes(self, modalities: Dict[str, jax.Array]) -> jax.Array:
        missing = set(self.cfg.towers) - set(modalities)
        if missing:
            raise ValueError(f"missing modalities: {sorted(missing)}")
        # deterministic modality order: config insertion order
        return jnp.concatenate(
            [self.towers[name].transform(modalities[name]) for name in self.cfg.towers], axis=1
        )

    def train(self, modalities: Dict[str, jax.Array], mesh: Optional[Mesh] = None,
              runtime: Optional[TrainRuntimeConfig] = None,
              checkpoint_dir: Optional[str] = None) -> "MDBN":
        """With ``checkpoint_dir``, each tower layer and the joint RBM are
        checkpointed as completed and restored on re-run (crash-resumable
        greedy pretraining)."""
        from ..checkpoint import LayerCheckpointer

        for name, tower_cfg in self.cfg.towers.items():
            ck = LayerCheckpointer(f"{checkpoint_dir}/tower_{name}") if checkpoint_dir else None
            tower = DBN(tower_cfg)
            tower.train(modalities[name], mesh=mesh, runtime=runtime, checkpointer=ck)
            self.towers[name] = tower
        codes = self._tower_codes(modalities)
        joint_cfg = dataclasses.replace(
            self.cfg.joint, n_visible=codes.shape[1], visible="bernoulli"
        )
        jck = LayerCheckpointer(f"{checkpoint_dir}/joint") if checkpoint_dir else None
        if jck is not None and jck.has_layer("joint"):
            state, cfg = jck.load_layer("joint")
            if cfg != joint_cfg:
                raise ValueError(
                    "checkpointed joint RBM was trained with a different config "
                    "(e.g. tower code width changed); clear the checkpoint "
                    f"directory to retrain.\ncheckpoint: {cfg}\ncurrent: {joint_cfg}")
            self.joint = RBM(cfg)
            self.joint.state = state
        else:
            self.joint = RBM(joint_cfg, key=jax.random.PRNGKey(self.cfg.seed + 997))
            self.joint.train(codes, mesh=mesh, runtime=runtime)
            if jck is not None:
                jck.save_layer("joint", self.joint.state, self.joint.cfg)
        return self

    def transform(self, modalities: Dict[str, jax.Array]) -> jax.Array:
        if self.joint is None:
            raise RuntimeError("MDBN.transform called before train")
        return self.joint.transform(self._tower_codes(modalities))

    # -- missing-modality inference -------------------------------------------

    def _code_layout(self):
        """[(name, slice into the joint visible vector)] in config order."""
        out, offset = [], 0
        for name in self.cfg.towers:
            width = self.towers[name].layers[-1].cfg.n_hidden
            out.append((name, slice(offset, offset + width)))
            offset += width
        return out, offset

    def _infer_full_codes(self, modalities: Dict[str, jax.Array],
                          n_gibbs: int, seed: int,
                          n_chains: int = 8) -> jax.Array:
        """Joint visible vector with observed tower codes clamped and the
        missing towers' blocks filled by the conditional posterior mean
        E[code_missing | code_observed] under the joint RBM (clamped Gibbs,
        ``n_chains`` chains per patient, second half of each chain averaged —
        see ops.sample.gibbs_sample_clamped for why averaging, not a single
        final state, is the right deterministic readout)."""
        if self.joint is None:
            raise RuntimeError("called before train")
        unknown = set(modalities) - set(self.cfg.towers)
        if unknown:
            raise ValueError(f"unknown modalities: {sorted(unknown)}")
        observed = [n for n in self.cfg.towers if n in modalities]
        if not observed:
            raise ValueError("need at least one observed modality")
        rows = {int(modalities[n].shape[0]) for n in observed}
        if len(rows) != 1:
            raise ValueError(f"observed modalities disagree on rows: {rows}")
        n = rows.pop()
        layout, total = self._code_layout()
        import numpy as np
        v0 = np.full((n, total), 0.5, np.float32)
        mask = np.zeros(total, np.float32)
        for name, sl in layout:
            if name in modalities:
                v0[:, sl] = np.asarray(
                    self.towers[name].transform(modalities[name]), np.float32)
                mask[sl] = 1.0
        from ..ops.sample import gibbs_sample_clamped

        vmean, _ = gibbs_sample_clamped(
            self.joint.params, jnp.asarray(v0), jnp.asarray(mask),
            jax.random.PRNGKey(seed), self.joint.cfg, n_gibbs,
            n_burnin=n_gibbs // 2, n_chains=n_chains)
        return vmean

    def impute(self, modalities: Dict[str, jax.Array], n_gibbs: int = 200,
               seed: int = 0, n_chains: int = 8) -> Dict[str, jax.Array]:
        """Infer the modalities ABSENT from ``modalities`` (e.g. a patient
        cohort missing one omics platform): clamped Gibbs on the joint RBM
        infers the missing towers' top codes from the observed ones, then a
        mean-field generative down-pass maps each inferred code to that
        modality's feature space. Returns {missing_name: [n, features]}.

        After finetune_updown_labeled() the joint layer is directed; the
        clamped Gibbs here still uses the joint layer's recognition weights
        as the (approximate) conditional — the 2006 convention that
        recognition weights ARE the model's inference machinery."""
        missing = [n for n in self.cfg.towers if n not in modalities]
        if not missing:
            raise ValueError("all modalities observed — nothing to impute")
        codes = self._infer_full_codes(modalities, n_gibbs, seed)
        layout, _ = self._code_layout()
        from ..ops.sample import _down_pass_fn

        out: Dict[str, jax.Array] = {}
        for name, sl in layout:
            if name in modalities:
                continue
            # untied generative weights after finetune_updown, tied otherwise
            gen_layers = self.towers[name]._generative_layers()
            params_list = [p for p, _ in reversed(gen_layers)]
            cfgs = tuple(c for _, c in reversed(gen_layers))
            out[name] = _down_pass_fn(cfgs)(params_list, codes[:, sl])
        return out

    def transform_partial(self, modalities: Dict[str, jax.Array],
                          n_gibbs: int = 200, seed: int = 0) -> jax.Array:
        """Joint latent codes from a PARTIALLY observed cohort: missing tower
        codes are inferred by clamped Gibbs (see ``impute``), then the joint
        layer's mean-field transform runs on the completed code vector — so
        patients missing a platform can still be embedded/clustered. With all
        modalities present this is NOT ``transform`` (no Gibbs noise there);
        it raises to keep the deterministic path canonical."""
        if all(n in modalities for n in self.cfg.towers):
            raise ValueError("all modalities observed — use transform()")
        codes = self._infer_full_codes(modalities, n_gibbs, seed)
        return self.joint.transform(codes)

    def finetune(self, modalities: Dict[str, jax.Array], labels, n_classes: int,
                 epochs: int = 10, lr: float = 0.1, batch_size: int = 20,
                 seed: int = 0, mesh: Optional[Mesh] = None):
        """Supervised multimodal fine-tuning: softmax head on the joint code,
        cross-entropy backprop through the joint layer and every tower.
        Updates weights in place; returns the per-epoch loss history."""
        if self.joint is None:
            raise RuntimeError("MDBN.finetune called before train")
        from ..train.finetune import finetune_mdbn

        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        tower_p, joint_p, head, history = finetune_mdbn(
            towers, (self.joint.params, self.joint.cfg), modalities, labels,
            n_classes, epochs=epochs, lr=lr, batch_size=batch_size, seed=seed,
            mesh=mesh)
        for m, plist in tower_p.items():
            for rbm, new_params in zip(self.towers[m].layers, plist):
                rbm.state = rbm.state._replace(params=new_params)
        self.joint.state = self.joint.state._replace(params=joint_p)
        self._head = head
        return history

    def predict(self, modalities: Dict[str, jax.Array]) -> jax.Array:
        """Class predictions after finetune()."""
        if not hasattr(self, "_head"):
            raise RuntimeError("MDBN.predict called before finetune")
        from ..train.finetune import predict_mdbn

        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        return predict_mdbn(towers, (self.joint.params, self.joint.cfg),
                            self._head, modalities)

    def finetune_autoencoder(self, modalities: Dict[str, jax.Array],
                             epochs: int = 10, lr: float = 1e-3,
                             batch_size: int = 20, mesh: Optional[Mesh] = None):
        """Unsupervised multimodal deep-autoencoder fine-tuning (Hinton &
        Salakhutdinov 2006 applied across the towers + joint layer):
        encoder = towers -> concat -> joint code; the untied mirrored decoder
        reconstructs every modality; backprop the summed reconstruction loss.
        Updates all weights in place; returns the per-epoch loss history."""
        if self.joint is None:
            raise RuntimeError("MDBN.finetune_autoencoder called before train")
        from ..train.autoencoder import finetune_autoencoder_mdbn

        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        tower_p, joint_p, decoder, history = finetune_autoencoder_mdbn(
            towers, (self.joint.params, self.joint.cfg), modalities,
            epochs=epochs, lr=lr, batch_size=batch_size,
            decoder=getattr(self, "_decoder", None),  # resume, don't reset
            mesh=mesh)
        for m, plist in tower_p.items():
            for rbm, new_params in zip(self.towers[m].layers, plist):
                rbm.state = rbm.state._replace(params=new_params)
        self.joint.state = self.joint.state._replace(params=joint_p)
        self._decoder = decoder
        return history

    def fit_label_top(self, modalities: Dict[str, jax.Array], labels,
                      n_classes: int, n_hidden: int = 64, epochs: int = 20,
                      lr: float = 0.1, k: int = 1, batch_size: int = 20,
                      momentum: float = 0.0, l2: float = 0.0, seed: int = 0,
                      mesh: Optional[Mesh] = None):
        """Associative label-top RBM over [joint codes ; one-hot labels]
        (Hinton-Osindero-Teh 2006 §4 applied to the multimodal join): the
        generative alternative to the backprop head — free-energy
        classification of patients from all modalities. The towers and joint
        RBM are NOT modified. Calling again RESUMES the stored top."""
        if self.joint is None:
            raise RuntimeError("MDBN.fit_label_top called before train")
        from ..train.labeled import fit_label_top

        prev = getattr(self, "_label_top", None)
        if prev is not None and prev[1] != n_classes:
            raise ValueError(f"stored label top has {prev[1]} classes, "
                             f"got n_classes={n_classes}")
        codes = self.transform(modalities)
        params, history = fit_label_top(
            [], codes, labels, n_classes, n_hidden=n_hidden, epochs=epochs,
            lr=lr, k=k, batch_size=batch_size, momentum=momentum, l2=l2,
            seed=seed, params=prev[0] if prev else None, mesh=mesh)
        self._label_top = (params, n_classes)
        return history

    def predict_generative(self, modalities: Dict[str, jax.Array]) -> jax.Array:
        """Free-energy classification through the label-top RBM."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("MDBN.predict_generative called before "
                               "fit_label_top")
        from ..train.labeled import predict_label_top

        params, n_classes = self._label_top
        return predict_label_top(params, [], self.transform(modalities),
                                 n_classes)

    def class_posterior(self, modalities: Dict[str, jax.Array]) -> jax.Array:
        """Exact p(y | modalities) under the associative model."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("MDBN.class_posterior called before "
                               "fit_label_top")
        from ..train.labeled import label_top_logits

        params, n_classes = self._label_top
        return jax.nn.softmax(label_top_logits(
            params, [], self.transform(modalities), n_classes), axis=1)

    def finetune_updown(self, modalities: Dict[str, jax.Array],
                        epochs: int = 10, lr: float = 0.01, k: int = 1,
                        batch_size: int = 20, seed: int = 0,
                        mesh: Optional[Mesh] = None):
        """Generative up-down (contrastive wake-sleep) fine-tuning of the
        full multimodal model: the joint RBM is the undirected top, every
        tower layer becomes a directed sigmoid layer (train/updown.py).
        Unties each tower's recognition/generative weights and tunes both
        plus the joint RBM; transform() then uses the fine-tuned
        recognition weights, generate()/impute() the untied generative
        weights. Calling again RESUMES from the stored generative weights.
        Returns the per-epoch mean wake reconstruction-mse history."""
        if self.joint is None:
            raise RuntimeError("MDBN.finetune_updown called before train")
        from ..train.updown import finetune_updown_mdbn

        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        gen = ({m: self.towers[m]._gen for m in self.cfg.towers}
               if all(hasattr(self.towers[m], "_gen") for m in self.cfg.towers)
               else None)
        rec, gen, joint_p, history = finetune_updown_mdbn(
            towers, (self.joint.params, self.joint.cfg), modalities,
            epochs=epochs, lr=lr, k=k, batch_size=batch_size, seed=seed,
            gen=gen, mesh=mesh)
        for m, plist in rec.items():
            for rbm, new_params in zip(self.towers[m].layers, plist):
                rbm.state = rbm.state._replace(params=new_params)
            # stored on the tower DBN so tower.save()/load() persists it
            self.towers[m]._gen = gen[m]
        self.joint.state = self.joint.state._replace(params=joint_p)
        return history

    def finetune_updown_labeled(self, modalities: Dict[str, jax.Array],
                                labels, epochs: int = 10, lr: float = 0.01,
                                k: int = 1, batch_size: int = 20,
                                seed: int = 0, mesh: Optional[Mesh] = None):
        """The COMPLETE Hinton-Osindero-Teh 2006 fine-tuning on the
        multimodal tree: up-down with the associative label top
        (fit_label_top must run first) as the only undirected module —
        every tower layer AND the joint layer become directed; wake clamps
        the true patient label, sleep dreams joint code AND label.
        predict_generative/class_posterior then read the tuned associative
        model; generate()/generate_class() dream through the untied joint +
        tower generative weights. Returns per-epoch wake mse history."""
        if self.joint is None:
            raise RuntimeError("MDBN.finetune_updown_labeled called before "
                               "train")
        if not hasattr(self, "_label_top"):
            raise RuntimeError("MDBN.finetune_updown_labeled called before "
                               "fit_label_top")
        from ..train.updown import finetune_updown_mdbn_labeled

        top, n_classes = self._label_top
        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        gen = ({m: self.towers[m]._gen for m in self.cfg.towers}
               if all(hasattr(self.towers[m], "_gen") for m in self.cfg.towers)
               else None)
        rec, gen, joint_p, joint_gen, top, history = \
            finetune_updown_mdbn_labeled(
                towers, (self.joint.params, self.joint.cfg), top, modalities,
                labels, n_classes, epochs=epochs, lr=lr, k=k,
                batch_size=batch_size, seed=seed, gen=gen,
                joint_gen=getattr(self, "_joint_gen", None), mesh=mesh)
        for m, plist in rec.items():
            for rbm, new_params in zip(self.towers[m].layers, plist):
                rbm.state = rbm.state._replace(params=new_params)
            self.towers[m]._gen = gen[m]
        self.joint.state = self.joint.state._replace(params=joint_p)
        self._joint_gen = joint_gen
        self._label_top = (top, n_classes)
        return history

    def _dream_down(self, codes: jax.Array, joint_gen) -> Dict[str, jax.Array]:
        """Generative down-pass from a joint code batch: ``joint_gen``
        (untied after labeled up-down, else the joint RBM's tied (W, b))
        maps codes to concat probabilities, then each tower's generative
        layers map its slice to feature space."""
        from ..ops.sample import _down_pass_fn

        Wjg, bjg = joint_gen
        concat = jax.nn.sigmoid(codes @ Wjg.T + bjg)
        out: Dict[str, jax.Array] = {}
        offset = 0
        for name in self.cfg.towers:
            tower = self.towers[name]
            width = tower.layers[-1].cfg.n_hidden
            code = concat[:, offset:offset + width]
            offset += width
            gen_layers = tower._generative_layers()
            params_list = [p for p, _ in reversed(gen_layers)]
            cfgs = tuple(c for _, c in reversed(gen_layers))
            out[name] = _down_pass_fn(cfgs)(params_list, code)
        return out

    def generate_class(self, label: int, n_samples: int = 16,
                       n_gibbs: int = 200, seed: int = 0) -> Dict[str, jax.Array]:
        """Dream multi-omics profiles of ONE class: clamped-label Gibbs in
        the label top yields joint codes, then the generative down-pass
        (untied joint weights after finetune_updown_labeled, else the tied
        joint RBM weights) maps them to every modality."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("MDBN.generate_class called before "
                               "fit_label_top")
        from ..train.labeled import generate_class_conditional

        params, n_classes = self._label_top
        codes = generate_class_conditional(params, [], label, n_classes,
                                           n_samples=n_samples,
                                           n_gibbs=n_gibbs, seed=seed)
        joint_gen = getattr(self, "_joint_gen",
                            (self.joint.params.W, self.joint.params.b))
        return self._dream_down(codes, joint_gen)

    def reconstruct(self, modalities: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Deterministic encode->decode of every modality (untied fine-tuned
        decoder after finetune_autoencoder(), else the tied W^T down-pass)."""
        if self.joint is None:
            raise RuntimeError("MDBN.reconstruct called before train")
        from ..train.autoencoder import reconstruct_mdbn

        towers = {m: [(r.params, r.cfg) for r in self.towers[m].layers]
                  for m in self.cfg.towers}
        return reconstruct_mdbn(towers, (self.joint.params, self.joint.cfg),
                                getattr(self, "_decoder", None), modalities)

    def generate(self, n_samples: int = 16, n_gibbs: int = 200, seed: int = 0) -> Dict[str, jax.Array]:
        """Generate synthetic multi-omics profiles: Gibbs in the joint RBM,
        split the concatenated code, mean-field down-pass per tower. After
        finetune_updown_labeled() the joint layer is directed and the label
        top is the undirected top, so the Gibbs runs there (label
        marginalized by softmax sampling) and the down-pass goes through
        the untied joint generative weights."""
        if self.joint is None:
            raise RuntimeError("MDBN.generate called before train")
        if hasattr(self, "_joint_gen"):
            if not hasattr(self, "_label_top"):
                raise RuntimeError(
                    "joint generative weights exist (labeled up-down) but no "
                    "label top is stored; the undirected top is gone")
            from ..train.labeled import generate_labeled_model

            params, n_classes = self._label_top
            codes = generate_labeled_model(params, [], n_classes,
                                           n_samples=n_samples,
                                           n_gibbs=n_gibbs, seed=seed)
            return self._dream_down(codes, self._joint_gen)
        from ..ops.sample import generate_from_stack, gibbs_sample, _down_pass_fn

        key = jax.random.PRNGKey(seed)
        kinit, kgibbs = jax.random.split(key)
        jcfg = self.joint.cfg
        v0 = (jax.random.uniform(kinit, (n_samples, jcfg.n_visible)) < 0.5).astype(
            self.joint.params.W.dtype)
        codes, _ = gibbs_sample(self.joint.params, v0, kgibbs, jcfg, n_gibbs)
        out: Dict[str, jax.Array] = {}
        offset = 0
        for name in self.cfg.towers:
            tower = self.towers[name]
            width = tower.layers[-1].cfg.n_hidden
            code = codes[:, offset:offset + width]
            offset += width
            # untied generative weights after finetune_updown, tied otherwise
            gen_layers = tower._generative_layers()
            params_list = [p for p, _ in reversed(gen_layers)]
            cfgs = tuple(c for _, c in reversed(gen_layers))
            out[name] = _down_pass_fn(cfgs)(params_list, code)
        return out

    # -- persistence ---------------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        for name, tower in self.towers.items():
            tower.save(os.path.join(directory, f"tower_{name}"))
        if self.joint is not None:
            self.joint.save(os.path.join(directory, "joint"))
        from ..config import save_config

        save_config(self.cfg, os.path.join(directory, "mdbn.config.json"))
        with open(os.path.join(directory, "structure.json"), "w") as f:
            json.dump({"towers": list(self.towers), "has_joint": self.joint is not None}, f)
        from .dbn import save_decoder, save_head

        save_head(getattr(self, "_head", None), directory)
        save_decoder(getattr(self, "_decoder", None), directory,
                     filename="mdbn_decoder.npz")
        from .dbn import save_gen, save_label_top

        save_label_top(getattr(self, "_label_top", None), directory)
        jg = getattr(self, "_joint_gen", None)
        save_gen([jg] if jg is not None else None, directory,
                 filename="joint_gen.npz")

    @classmethod
    def load(cls, directory: str) -> "MDBN":
        from ..config import load_config
        from .dbn import DBN
        from .rbm import RBM

        mdbn = cls(load_config(os.path.join(directory, "mdbn.config.json")))
        with open(os.path.join(directory, "structure.json")) as f:
            meta = json.load(f)
        for name in meta["towers"]:
            mdbn.towers[name] = DBN.load(os.path.join(directory, f"tower_{name}"))
        if meta["has_joint"]:
            mdbn.joint = RBM.load(os.path.join(directory, "joint"))
        from .dbn import load_head

        head = load_head(directory)
        if head is not None:
            mdbn._head = head
        from .dbn import load_decoder

        decoder = load_decoder(directory, filename="mdbn_decoder.npz")
        if decoder is not None:
            mdbn._decoder = decoder
        from .dbn import load_label_top

        label_top = load_label_top(directory)
        if label_top is not None:
            mdbn._label_top = label_top
        from .dbn import load_gen

        jg = load_gen(directory, filename="joint_gen.npz")
        if jg is not None:
            mdbn._joint_gen = jg[0]
        return mdbn

    @property
    def history(self) -> dict:
        h = {name: tower.history for name, tower in self.towers.items()}
        if self.joint is not None:
            h["joint"] = self.joint.history
        return h
