"""Deep belief network: greedy layer-wise RBM stacking (SURVEY.md §3.2).

The layer loop is a cold host loop (layers train strictly sequentially by
definition of greedy pretraining); each layer's training is the hot
whole-epoch-on-device path. Layer l consumes layer l-1's mean-field
*probabilities* as data (tutorial-lineage behavior).
"""

from __future__ import annotations

import json
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import DBNConfig, TrainRuntimeConfig
from ..ops.transform import stack_transform
from .rbm import RBM


class DBN:
    """>>> dbn = DBN(DBNConfig(layer_sizes=[400, 200, 50], visible="gaussian"))
    >>> dbn.train(data)             # greedy layer-wise pretraining
    >>> codes = dbn.transform(data) # top-layer mean-field code
    """

    def __init__(self, cfg: DBNConfig):
        self.cfg = cfg
        self.layers: List[RBM] = []

    def train(self, data, mesh: Optional[Mesh] = None,
              runtime: Optional[TrainRuntimeConfig] = None,
              layer_callback: Optional[Callable[[int, RBM], None]] = None,
              checkpointer=None) -> "DBN":
        """Greedy layer-wise pretraining. With a ``LayerCheckpointer``,
        completed layers are restored instead of retrained (layer boundaries
        are the natural resume points, SURVEY.md §5) and each newly trained
        layer is saved."""
        reps = jnp.asarray(data, jnp.dtype(self.cfg.param_dtype))
        key = jax.random.PRNGKey(self.cfg.seed)
        self.layers = []
        for l in range(len(self.cfg.layer_sizes)):
            key, lkey = jax.random.split(key)
            name = f"layer{l}"
            expected_cfg = self.cfg.rbm_config(l, reps.shape[1])
            restored = False
            if checkpointer is not None and checkpointer.has_layer(name):
                state, cfg = checkpointer.load_layer(name)
                if cfg != expected_cfg:
                    raise ValueError(
                        f"checkpointed {name} was trained with a different config "
                        f"than the current run (e.g. layer sizes or data width "
                        f"changed); clear the checkpoint directory to retrain. "
                        f"checkpoint: {cfg}\ncurrent: {expected_cfg}")
                rbm = RBM(cfg, key=lkey)
                rbm.state = state
                restored = True
            else:
                rbm = RBM(expected_cfg, key=lkey)
                rbm.train(reps, mesh=mesh, runtime=runtime)
                if checkpointer is not None:
                    checkpointer.save_layer(name, rbm.state, rbm.cfg)
            self.layers.append(rbm)
            # callbacks fire only for layers trained in THIS run (restored
            # layers have no metrics/history to report)
            if layer_callback is not None and not restored:
                layer_callback(l, rbm)
            if l + 1 < len(self.cfg.layer_sizes):
                reps = rbm.transform(reps)
        return self

    def transform(self, v) -> jax.Array:
        if not self.layers:
            # an empty stack would silently return the INPUT as the "code"
            raise RuntimeError("DBN.transform called before train(): no "
                               "layers have been trained yet")
        v = jnp.asarray(v, jnp.dtype(self.cfg.param_dtype))
        return stack_transform([(r.params, r.cfg) for r in self.layers], v)

    def finetune(self, data, labels, n_classes: int, epochs: int = 10,
                 lr: float = 0.1, batch_size: int = 20, seed: int = 0,
                 mesh=None):
        """Supervised fine-tuning (tutorial-lineage phase 2): softmax head on
        the top code, cross-entropy backprop through the whole stack. Updates
        the layers' weights in place; returns the per-epoch loss history."""
        from ..train.finetune import finetune_stack

        stack, head, history = finetune_stack(
            [(r.params, r.cfg) for r in self.layers], data, labels, n_classes,
            epochs=epochs, lr=lr, batch_size=batch_size, seed=seed, mesh=mesh)
        for rbm, new_params in zip(self.layers, stack):
            rbm.state = rbm.state._replace(params=new_params)
        self._head = head
        return history

    def predict(self, x) -> jax.Array:
        """Class predictions after finetune()."""
        if not hasattr(self, "_head"):
            raise RuntimeError("DBN.predict called before finetune")
        from ..train.finetune import predict_stack

        return predict_stack([(r.params, r.cfg) for r in self.layers], self._head, x)

    def finetune_autoencoder(self, data, epochs: int = 10, lr: float = 1e-3,
                             batch_size: Optional[int] = None, mesh=None):
        """Unsupervised deep-autoencoder fine-tuning (Hinton & Salakhutdinov
        2006): unroll the pretrained stack into encoder + untied decoder and
        backprop the reconstruction loss. Updates the layers' weights in
        place (transform then uses the fine-tuned encoder) and stores the
        untied decoder for reconstruct(); calling again RESUMES from the
        stored decoder. Returns the per-epoch loss history.

        After this phase the weights define an autoencoder, not an RBM
        energy model: transform/reconstruct are the supported outputs, while
        energy-based methods (free_energy, generate, AIS likelihood) refer
        to the pretrained generative semantics this phase leaves behind."""
        from ..train.autoencoder import finetune_autoencoder_stack

        tuned, decoder, history = finetune_autoencoder_stack(
            [(r.params, r.cfg) for r in self.layers], data, epochs=epochs,
            lr=lr, batch_size=batch_size or self.cfg.batch_size,
            decoder=getattr(self, "_decoder", None),  # resume, don't reset
            mesh=mesh)
        for rbm, new_params in zip(self.layers, tuned):
            rbm.state = rbm.state._replace(params=new_params)
        self._decoder = decoder
        return history

    def fit_label_top(self, data, labels, n_classes: int, n_hidden: int = 64,
                      epochs: int = 20, lr: float = 0.1, k: int = 1,
                      batch_size: int = 20, momentum: float = 0.0,
                      l2: float = 0.0, seed: int = 0, mesh=None):
        """Train an associative label-top RBM over [top codes ; one-hot
        labels] (Hinton-Osindero-Teh 2006 §4): the generative alternative to
        the backprop head — classification by free energy
        (predict_generative / class_posterior) and class-conditional
        generation (generate_class). The pretrained stack is NOT modified.
        Calling again RESUMES the stored top. Returns per-epoch history."""
        from ..train.labeled import fit_label_top

        prev = getattr(self, "_label_top", None)
        if prev is not None and prev[1] != n_classes:
            raise ValueError(f"stored label top has {prev[1]} classes, "
                             f"got n_classes={n_classes}")
        params, history = fit_label_top(
            [(r.params, r.cfg) for r in self.layers], data, labels, n_classes,
            n_hidden=n_hidden, epochs=epochs, lr=lr, k=k,
            batch_size=batch_size, momentum=momentum, l2=l2, seed=seed,
            params=prev[0] if prev else None, mesh=mesh)
        self._label_top = (params, n_classes)
        return history

    def predict_generative(self, x) -> jax.Array:
        """Free-energy classification through the label-top RBM."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("DBN.predict_generative called before "
                               "fit_label_top")
        from ..train.labeled import predict_label_top

        params, n_classes = self._label_top
        return predict_label_top(params, [(r.params, r.cfg) for r in self.layers],
                                 x, n_classes)

    def class_posterior(self, x) -> jax.Array:
        """Exact p(y | x) under the associative model: softmax of the
        per-class negative free energies."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("DBN.class_posterior called before "
                               "fit_label_top")
        from ..train.labeled import label_top_logits

        params, n_classes = self._label_top
        return jax.nn.softmax(label_top_logits(
            params, [(r.params, r.cfg) for r in self.layers], x, n_classes),
            axis=1)

    def generate_class(self, label: int, n_samples: int = 16,
                       n_gibbs: int = 200, seed: int = 0) -> jax.Array:
        """Dream inputs of ONE class: clamped-label Gibbs in the label-top
        RBM, then the generative down-pass (untied weights after
        finetune_updown)."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("DBN.generate_class called before "
                               "fit_label_top")
        from ..train.labeled import generate_class_conditional

        params, n_classes = self._label_top
        return generate_class_conditional(
            params, self._generative_layers(), label, n_classes,
            n_samples=n_samples, n_gibbs=n_gibbs, seed=seed)

    def finetune_updown(self, data, epochs: int = 10, lr: float = 0.01,
                        k: int = 1, batch_size: Optional[int] = None,
                        seed: int = 0, mesh=None):
        """Generative fine-tuning by the up-down (contrastive wake-sleep)
        algorithm (Hinton, Osindero & Teh 2006, appendix B): unties each
        directed layer's recognition and generative weights and tunes both
        plus the top RBM jointly. transform() then uses the fine-tuned
        recognition weights, generate() the untied generative down weights;
        calling again RESUMES from the stored generative weights. Returns
        the per-epoch wake reconstruction-mse history."""
        from ..train.updown import finetune_updown_stack

        rec, gen, top, history = finetune_updown_stack(
            [(r.params, r.cfg) for r in self.layers], data, epochs=epochs,
            lr=lr, k=k, batch_size=batch_size or self.cfg.batch_size,
            seed=seed, gen=getattr(self, "_gen", None), mesh=mesh)
        for rbm, new_params in zip(self.layers[:-1], rec):
            rbm.state = rbm.state._replace(params=new_params)
        self.layers[-1].state = self.layers[-1].state._replace(params=top)
        self._gen = gen
        return history

    def finetune_updown_labeled(self, data, labels, epochs: int = 10,
                                lr: float = 0.01, k: int = 1,
                                batch_size: Optional[int] = None,
                                seed: int = 0, mesh=None):
        """The COMPLETE Hinton-Osindero-Teh 2006 fine-tuning: up-down over
        the whole stack with the associative label top (fit_label_top must
        run first) as the undirected top — wake clamps the true label,
        sleep dreams code AND label. Unties every stack layer's
        recognition/generative weights and tunes the label top;
        predict_generative/class_posterior/generate_class then read the
        tuned associative model. Returns per-epoch wake mse history."""
        if not hasattr(self, "_label_top"):
            raise RuntimeError("DBN.finetune_updown_labeled called before "
                               "fit_label_top")
        from ..train.updown import finetune_updown_labeled

        top, n_classes = self._label_top
        prev_gen = getattr(self, "_gen", None)
        if prev_gen is not None and len(prev_gen) != len(self.layers):
            raise ValueError(
                f"stored generative weights cover {len(prev_gen)} layers but "
                f"labeled up-down unties all {len(self.layers)} (they came "
                "from unlabeled finetune_updown, which keeps the stack's own "
                "top RBM undirected); rerun from pretrained weights")
        rec, gen, top, history = finetune_updown_labeled(
            [(r.params, r.cfg) for r in self.layers], top, data, labels,
            n_classes, epochs=epochs, lr=lr, k=k,
            batch_size=batch_size or self.cfg.batch_size, seed=seed,
            gen=prev_gen, mesh=mesh)
        for rbm, new_params in zip(self.layers, rec):
            rbm.state = rbm.state._replace(params=new_params)
        self._gen = gen
        self._label_top = (top, n_classes)
        return history

    def reconstruct(self, v) -> jax.Array:
        """Deterministic encode->decode through the whole stack: the untied
        fine-tuned decoder after finetune_autoencoder(), else the tied W^T
        down-pass."""
        if not self.layers:
            raise RuntimeError("DBN.reconstruct called before train")
        from ..train.autoencoder import reconstruct_stack

        return reconstruct_stack([(r.params, r.cfg) for r in self.layers],
                                 getattr(self, "_decoder", None), v)

    def generate(self, n_samples: int = 16, n_gibbs: int = 200, seed: int = 0) -> jax.Array:
        """Sample from the DBN: Gibbs in the top RBM, mean-field down-pass.
        After finetune_updown() the down-pass uses the untied generative
        weights (the 2006 directed generative model). After
        finetune_updown_labeled() EVERY stack layer is directed and the
        undirected top is the associative label-top RBM, so generation
        Gibbs-samples (code, label) there — the label marginalized by
        softmax sampling — and dreams down through all generative layers."""
        gen = getattr(self, "_gen", None)
        if gen is not None and len(gen) == len(self.layers):
            if not hasattr(self, "_label_top"):
                raise RuntimeError(
                    "generative weights cover every layer (labeled up-down) "
                    "but no label top is stored; the undirected top is gone")
            from ..train.labeled import generate_labeled_model

            params, n_classes = self._label_top
            return generate_labeled_model(
                params, self._generative_layers(), n_classes,
                n_samples=n_samples, n_gibbs=n_gibbs, seed=seed)
        from ..ops.sample import generate_from_stack

        return generate_from_stack(self._generative_layers(),
                                   n_samples, jax.random.PRNGKey(seed), n_gibbs)

    def _generative_layers(self):
        """[(params, cfg)] with up-down's untied generative (W, b) swapped
        into the directed layers when present (tied weights otherwise)."""
        layers = [(r.params, r.cfg) for r in self.layers]
        gen = getattr(self, "_gen", None)
        if gen is not None:
            layers = [(p._replace(W=Wg, b=bg), cfg)
                      for (p, cfg), (Wg, bg) in zip(layers, gen)] + layers[len(gen):]
        return layers

    @property
    def history(self) -> List[list]:
        return [r.history for r in self.layers]

    # -- persistence ---------------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        for l, rbm in enumerate(self.layers):
            rbm.save(os.path.join(directory, f"layer{l}"))
        from ..config import save_config

        save_config(self.cfg, os.path.join(directory, "dbn.config.json"))
        with open(os.path.join(directory, "stack.json"), "w") as f:
            json.dump({"n_layers": len(self.layers)}, f)
        save_head(getattr(self, "_head", None), directory)
        save_decoder(getattr(self, "_decoder", None), directory)
        save_gen(getattr(self, "_gen", None), directory)
        save_label_top(getattr(self, "_label_top", None), directory)

    @classmethod
    def load(cls, directory: str) -> "DBN":
        from ..config import load_config

        dbn = cls(load_config(os.path.join(directory, "dbn.config.json")))
        with open(os.path.join(directory, "stack.json")) as f:
            n = json.load(f)["n_layers"]
        dbn.layers = [RBM.load(os.path.join(directory, f"layer{l}")) for l in range(n)]
        head = load_head(directory)
        if head is not None:
            dbn._head = head
        decoder = load_decoder(directory)
        if decoder is not None:
            dbn._decoder = decoder
        gen = load_gen(directory)
        if gen is not None:
            dbn._gen = gen
        label_top = load_label_top(directory)
        if label_top is not None:
            dbn._label_top = label_top
        return dbn


def save_head(head, directory: str) -> None:
    """Persist a finetune() softmax head (Wh, bh) so a save/load round-trip of
    a finetuned model keeps predict() working. With ``head=None`` any stale
    head.npz from a previous save into the same directory is removed."""
    path = os.path.join(directory, "head.npz")
    if head is None:
        if os.path.exists(path):
            os.remove(path)
        return
    import numpy as np

    np.savez(path, W=np.asarray(head[0]), b=np.asarray(head[1]))


def load_head(directory: str):
    path = os.path.join(directory, "head.npz")
    if not os.path.exists(path):
        return None
    import numpy as np

    with np.load(path) as z:
        return (jnp.asarray(z["W"]), jnp.asarray(z["b"]))


def save_decoder(decoder, directory: str,
                 filename: str = "decoder.npz") -> None:
    """Persist untied finetune_autoencoder() decoder weights (a list for a
    DBN stack, or the MDBN's {modality: [D...], "__joint__": [Dj]} dict), so
    a save/load round-trip of a fine-tuned model keeps reconstruct(). With
    ``decoder=None`` any stale file from a previous save into the same
    directory is removed — load() must never pair an old decoder with a new
    encoder."""
    path = os.path.join(directory, filename)
    if decoder is None:
        if os.path.exists(path):
            os.remove(path)
        return
    import numpy as np

    if isinstance(decoder, dict):
        arrays = {f"{m}::{i}": np.asarray(D)
                  for m, Ds in decoder.items() for i, D in enumerate(Ds)}
    else:
        arrays = {f"D{i}": np.asarray(D) for i, D in enumerate(decoder)}
    np.savez(path, **arrays)


def save_gen(gen, directory: str, filename: str = "gen.npz") -> None:
    """Persist up-down's untied generative (W, b) per directed layer (the
    MDBN stores its joint layer's pair as ``joint_gen.npz``). With
    ``gen=None`` any stale file from a previous save is removed — load()
    must never pair old generative weights with new recognition weights."""
    path = os.path.join(directory, filename)
    if gen is None:
        if os.path.exists(path):
            os.remove(path)
        return
    import numpy as np

    arrays = {}
    for i, (W, b) in enumerate(gen):
        arrays[f"W{i}"] = np.asarray(W)
        arrays[f"b{i}"] = np.asarray(b)
    np.savez(path, **arrays)


def load_gen(directory: str, filename: str = "gen.npz"):
    path = os.path.join(directory, filename)
    if not os.path.exists(path):
        return None
    import numpy as np

    with np.load(path) as z:
        n = len(z.files) // 2
        return [(jnp.asarray(z[f"W{i}"]), jnp.asarray(z[f"b{i}"]))
                for i in range(n)]


def save_label_top(label_top, directory: str) -> None:
    """Persist a fit_label_top() associative top (RBMParams, n_classes).
    With ``label_top=None`` any stale file from a previous save is removed."""
    path = os.path.join(directory, "label_top.npz")
    if label_top is None:
        if os.path.exists(path):
            os.remove(path)
        return
    import numpy as np

    params, n_classes = label_top
    np.savez(path, W=np.asarray(params.W), b=np.asarray(params.b),
             c=np.asarray(params.c), n_classes=np.asarray(n_classes))


def load_label_top(directory: str):
    path = os.path.join(directory, "label_top.npz")
    if not os.path.exists(path):
        return None
    import numpy as np

    from ..core.rbm_math import RBMParams

    with np.load(path) as z:
        return (RBMParams(W=jnp.asarray(z["W"]), b=jnp.asarray(z["b"]),
                          c=jnp.asarray(z["c"])), int(z["n_classes"]))


def load_decoder(directory: str, filename: str = "decoder.npz"):
    path = os.path.join(directory, filename)
    if not os.path.exists(path):
        return None
    import numpy as np

    with np.load(path) as z:
        if any("::" in k for k in z.files):  # MDBN dict layout
            out = {}
            for key in z.files:
                m, i = key.rsplit("::", 1)
                out.setdefault(m, []).append((int(i), jnp.asarray(z[key])))
            return {m: [D for _, D in sorted(lst)] for m, lst in out.items()}
        return [jnp.asarray(z[f"D{i}"]) for i in range(len(z.files))]
