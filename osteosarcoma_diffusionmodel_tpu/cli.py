"""Six-step pipeline CLI.

Step API preserved exactly from the reference (reference main.py:343-369):

    python main.py --config <yaml> \
        --steps {download,preprocess,pathways,train,generate,validate,all} \
        [--resume-training]

plus a `doctor` step replacing the reference's standalone debug_model.py
(dimension-consistency checks across config/data/checkpoint/scenarios).

Unlike the reference, `--resume-training` actually resumes (restores
params/optimizer/epoch from the latest checkpoint; the reference parses
the flag and ignores it, reference main.py:363-367 + SURVEY §5), and
`main` is importable as a module (the reference crashes on import
because torch is only imported under __main__, main.py:413).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd

from .config import Config
from .data.dataset import prepare_arrays
from .data.gdc_loader import GDCDataLoader
from .data.pathways import PathwayFeatures
from .data.preprocessor import OsteosarcomaPreprocessor
from .models.constraints import ConstraintSpec
from .training.checkpoint import load_metadata
from .training.trainer import Trainer, build_model
from .validation.validator import BiologicalValidator

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    # Plugins (e.g. the TPU runtime) may pre-configure root handlers at
    # interpreter start, which would turn basicConfig into a no-op and
    # swallow all pipeline INFO logs.
    force=True,
)
logger = logging.getLogger(__name__)

UPDATED_CONFIG_PATH = "config/config_updated.yaml"


def _banner(msg: str) -> None:
    logger.info("=" * 60)
    logger.info(msg)
    logger.info("=" * 60)


# ----------------------------------------------------------------------
def _pretrain_projects(config: Config):
    """pretrain_datasets entries that are GDC project ids (not local
    directories) and therefore need download/preprocess."""
    aug = config.training.augmentation
    if not (aug.cross_cancer_pretrain and aug.pretrain_datasets):
        return []
    return [e for e in aug.pretrain_datasets if not Path(e).is_dir()]


def download_data(config: Config):
    _banner("STEP 1: Downloading TARGET-OS data from GDC")
    loader = GDCDataLoader(
        project_id=config.data.gdc_project, data_dir=config.data.data_dir
    )
    results = loader.download_all(
        include_copy_number=config.data.download.copy_number
    )
    for project in _pretrain_projects(config):
        logger.info("Downloading pretrain cohort %s", project)
        GDCDataLoader(
            project_id=project,
            data_dir=Path(config.data.data_dir) / "pretrain" / project,
        ).download_all()
    logger.info("Downloaded data to: %s", results)
    return results


def preprocess_data(config: Config):
    _banner("STEP 2: Preprocessing data")
    processor = OsteosarcomaPreprocessor(
        raw_dir=Path(config.data.raw_dir),
        processed_dir=Path(config.data.processed_dir),
        config=config,
    )
    processed = processor.process_all()
    for project in _pretrain_projects(config):
        base = Path(config.data.data_dir) / "pretrain" / project
        if not (base / "raw").exists():
            logger.warning("Pretrain cohort %s has no raw data; skipping",
                           project)
            continue
        logger.info("Preprocessing pretrain cohort %s", project)
        OsteosarcomaPreprocessor(
            raw_dir=base / "raw",
            processed_dir=base / "processed",
            config=config,
        ).process_all()
    logger.info("Processed %d samples", len(processed["mutation_matrix"]))
    return processed


def compute_pathway_features(config: Config):
    _banner("STEP 3: Computing pathway features")
    processed_dir = Path(config.data.processed_dir)
    expression = pd.read_csv(
        processed_dir / "expression_matrix_aligned.csv", index_col=0
    )
    mutations = pd.read_csv(
        processed_dir / "mutation_matrix_aligned.csv", index_col=0
    )

    eng = PathwayFeatures(config.data.pathway_database)
    eng.load_gene_sets()

    pathway_scores = eng.compute_pathway_scores_from_expression(expression)
    pathway_scores.to_csv(processed_dir / "pathway_scores.csv")

    pathway_mut = eng.compute_pathway_scores_from_mutations(mutations)
    pathway_mut.to_csv(processed_dir / "pathway_mutation_scores.csv")

    gene_pathway = eng.create_gene_pathway_matrix()
    gene_pathway.to_csv(processed_dir / "gene_pathway_matrix.csv")

    logger.info("Computed %d pathway features", len(pathway_scores.columns))
    return pathway_scores


def _build_constraint_spec(config: Config, arrays) -> ConstraintSpec:
    eng = PathwayFeatures(config.data.pathway_database)
    gene_sets = eng.load_gene_sets()
    return ConstraintSpec.build(
        mutation_genes=arrays.mutation_genes,
        expression_genes=arrays.expression_genes,
        pathway_names=arrays.pathway_names,
        gene_sets=gene_sets,
        exclusive_gene_pairs=config.evaluation.mutually_exclusive_pairs,
        correlation_rules=config.evaluation.required_correlations,
        mutation_data=arrays.data[:, : len(arrays.mutation_genes)],
    )


def train_model(config: Config, resume: bool = False, profile: bool = False):
    _banner("STEP 4: Training model")
    arrays, dims = prepare_arrays(config)
    logger.info(
        "Model configured with: Mut=%d, Expr=%d, Path=%d, Cond=%d",
        dims.mutation_dim, dims.expression_dim, dims.pathway_dim,
        dims.condition_dim,
    )

    constraint_spec = _build_constraint_spec(config, arrays)
    model = build_model(config, dims, constraint_spec)
    trainer = Trainer(model, arrays, dims, config)

    from .data.dataset import load_pretrain_arrays

    pretrain_arrays = load_pretrain_arrays(config, arrays)
    if pretrain_arrays is not None:
        _banner(
            f"STEP 4a: Cross-cancer pretraining "
            f"({pretrain_arrays.n_samples} samples)"
        )
        import copy

        pre_cfg = copy.deepcopy(config)
        pre_cfg.training.num_epochs = config.training.pretrain_epochs
        pre_cfg.training.patience = config.training.pretrain_epochs
        pre_cfg.training.save_dir = str(
            Path(config.training.save_dir) / "pretrain"
        )
        pre_trainer = Trainer(model, pretrain_arrays, dims, pre_cfg)
        pre_trainer.train()
        # Finetune from the pretrained weights; fresh optimizer state.
        trainer.params = pre_trainer.params
        trainer.batch_stats = pre_trainer.batch_stats
    if profile:
        from .utils.profiling import profile_trace

        trace_dir = str(Path(config.output.results_dir) / "profile")
        with profile_trace(trace_dir):
            history = trainer.train(resume=resume)
    else:
        history = trainer.train(resume=resume)

    ftc = config.training.sample_path_finetune
    if ftc.enabled:
        if config.model.architecture != "diffusion":
            logger.warning(
                "sample_path_finetune only applies to the diffusion "
                "architecture; skipping (architecture=%s)",
                config.model.architecture,
            )
        elif getattr(model, "discrete_head", False):
            logger.warning(
                "sample_path_finetune is incompatible with the discrete "
                "mutation head (no pathwise gradient through bit draws); "
                "skipping"
            )
        elif getattr(model, "latent_factor_dim", 0) > 0:
            logger.warning(
                "sample_path_finetune does not support latent-factor "
                "conditioning (the DDIM chain would need prior draws "
                "threaded through the loss); skipping"
            )
        elif getattr(model, "ar_head", False):
            logger.warning(
                "sample_path_finetune is pointless with the AR mutation "
                "head: generation replaces the mutation scores its "
                "co-occurrence objective tunes with the sequential AR "
                "draw (and its shared Adam would perturb the AR branch "
                "outside its dedicated optimizer); skipping"
            )
        else:
            _banner("STEP 4b: Sample-path fine-tuning (differentiable DDIM)")
            import jax

            from .training.checkpoint import BEST_NAME
            from .training.finetune import sample_path_finetune

            # Fine-tune the checkpoint the generate step will load,
            # keeping the pre-finetune best recoverable and anchoring
            # only on training rows (the best-val checkpoint must not
            # be tuned against its own validation split).
            state = trainer.checkpoints.restore(
                BEST_NAME, trainer.state_dict(0, 0.0)
            )
            trainer.checkpoints.save(f"{BEST_NAME}_prefinetune", state)
            import numpy as _np

            tr = _np.asarray(trainer.train_idx)
            new_params, ft_hist = sample_path_finetune(
                model,
                state["params"],
                trainer._data[tr],
                trainer._cond[tr],
                jax.random.PRNGKey(config.training.random_seed + 77),
                steps=ftc.steps,
                ddim_steps=ftc.ddim_steps,
                sample_batch=ftc.sample_batch,
                learning_rate=ftc.learning_rate,
                soft_tau=ftc.soft_tau,
                cooccurrence_weight=ftc.cooccurrence_weight,
                anchor_weight=ftc.anchor_weight,
            )
            state["params"] = new_params
            trainer.checkpoints.save(BEST_NAME, state)
            trainer.checkpoints.wait()
            trainer.params = new_params
            if ft_hist["cooccurrence"]:
                logger.info(
                    "Fine-tune done: cooccurrence %.4f -> %.4f",
                    ft_hist["cooccurrence"][0], ft_hist["cooccurrence"][-1],
                )

    # Persist the dim-frozen config for the generate step
    # (reference main.py:183-184) and the loss history for analysis.
    config.to_yaml(UPDATED_CONFIG_PATH)
    results_dir = Path(config.output.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "epoch": range(len(history.train_loss)),
            "train_loss": history.train_loss,
            "val_loss": history.val_loss,
            "epoch_seconds": history.epoch_seconds,
        }
    ).to_csv(results_dir / "training_history.csv", index=False)
    logger.info("Training complete!")
    return history


def generate_synthetic_patients(config: Config):
    _banner("STEP 5: Generating synthetic patients")
    from .generation.generator import SyntheticPatientGenerator, load_trained_model

    updated = Path(UPDATED_CONFIG_PATH)
    if updated.exists():
        # Prefer the train-time config for model/data consistency
        # (reference main.py:199-202) but keep the invoking config's
        # generation/output/training sections — otherwise
        # generation-time flags (sampler, calibrate_marginals,
        # scenarios...) and the checkpoint location are silently
        # overridden by whatever was set when `train` last ran. (The
        # model section is additionally re-pinned from the checkpoint's
        # own metadata inside load_trained_model.)
        invoking = config
        config = Config.from_yaml(updated)
        config.generation = invoking.generation
        config.output = invoking.output
        config.training = invoking.training

    model, params, batch_stats, config, dims = load_trained_model(
        Path(config.training.save_dir), config
    )
    mesh = None
    if config.training.num_devices and config.training.num_devices > 1:
        import jax

        from .parallel.mesh import make_mesh

        if len(jax.devices()) >= config.training.num_devices:
            mesh = make_mesh(config.training.num_devices)
            logger.info("Generation mesh: %s", dict(mesh.shape))
    from .training.checkpoint import load_data_stats

    generator = SyntheticPatientGenerator(
        model, params, config, dims, batch_stats, mesh=mesh,
        data_stats=load_data_stats(Path(config.training.save_dir)),
    )

    scenarios = config.generation.scenarios
    samples_per_scenario = config.generation.num_synthetic_samples // len(scenarios)
    all_synthetic = generator.generate_scenarios(scenarios, samples_per_scenario)

    processed_dir = Path(config.data.processed_dir)
    gene_names = {
        "mutation_genes": list(
            pd.read_csv(processed_dir / "mutation_matrix_aligned.csv",
                        index_col=0, nrows=0).columns
        ),
        "expression_genes": list(
            pd.read_csv(processed_dir / "expression_matrix_aligned.csv",
                        index_col=0, nrows=0).columns
        ),
        "pathway_names": list(
            pd.read_csv(processed_dir / "pathway_scores.csv",
                        index_col=0, nrows=0).columns
        ),
    }

    output_dir = Path(config.output.synthetic_data_dir)
    for scenario_name, synthetic in all_synthetic.items():
        generator.save_synthetic_data(
            synthetic, output_dir / scenario_name, gene_names,
            prefix=scenario_name,
        )
    logger.info("Synthetic data saved to %s", output_dir)
    return all_synthetic


def validate_synthetic_patients(config: Config) -> Dict[str, float]:
    _banner("STEP 6: Validating synthetic patients")
    processed_dir = Path(config.data.processed_dir)

    from .utils.io import read_matrix_csv

    real_mut = read_matrix_csv(processed_dir / "mutation_matrix_aligned.csv")
    real_expr = read_matrix_csv(processed_dir / "expression_matrix_aligned.csv")
    real_path = read_matrix_csv(processed_dir / "pathway_scores.csv")

    output_dir = Path(config.output.synthetic_data_dir)
    muts, exprs, paths = [], [], []
    for scenario in config.generation.scenarios:
        scenario_dir = output_dir / scenario.name
        muts.append(read_matrix_csv(
            scenario_dir / f"{scenario.name}_mutations.csv", index_col=None))
        exprs.append(read_matrix_csv(
            scenario_dir / f"{scenario.name}_expression.csv", index_col=None))
        paths.append(read_matrix_csv(
            scenario_dir / f"{scenario.name}_pathways.csv", index_col=None))
    synth_mut = pd.concat(muts, ignore_index=True)
    synth_expr = pd.concat(exprs, ignore_index=True)
    synth_path = pd.concat(paths, ignore_index=True)

    # Fix vs reference: pass the gene-pathway matrix so coherence runs
    # (the reference never passes it; SURVEY §3.3).
    gpm_path = processed_dir / "gene_pathway_matrix.csv"
    gene_pathway_matrix = (
        pd.read_csv(gpm_path, index_col=0) if gpm_path.exists() else None
    )

    validator = BiologicalValidator(config)
    results = validator.validate_all(
        real_mutations=real_mut,
        real_expression=real_expr,
        real_pathways=real_path,
        synth_mutations=synth_mut,
        synth_expression=synth_expr,
        synth_pathways=synth_path,
        pathway_gene_matrix=gene_pathway_matrix,
    )

    results_dir = Path(config.output.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame([results]).to_csv(
        results_dir / "validation_results.csv", index=False
    )
    logger.info("Validation results saved to %s",
                results_dir / "validation_results.csv")
    return results


def analysis_report(config: Config) -> Dict[str, float]:
    """Extra step: notebook-equivalent figures + graded text summary
    (reference notebooks/analysis.ipynb as library code)."""
    _banner("REPORT: analysis figures + summary")
    from .analysis.report import AnalysisReport, write_summary_report

    processed_dir = Path(config.data.processed_dir)
    results_dir = Path(config.output.results_dir)

    real_mut = pd.read_csv(processed_dir / "mutation_matrix_aligned.csv", index_col=0)
    real_expr = pd.read_csv(
        processed_dir / "expression_matrix_aligned.csv", index_col=0
    )
    real_path = pd.read_csv(processed_dir / "pathway_scores.csv", index_col=0)
    clinical = pd.read_csv(processed_dir / "clinical_aligned.csv")

    output_dir = Path(config.output.synthetic_data_dir)
    muts, exprs, paths = [], [], []
    scenario_survival = {}
    if "survival_days" in clinical.columns and "event_occurred" in clinical.columns:
        scenario_survival["real_cohort"] = (
            clinical["survival_days"].values, clinical["event_occurred"].values
        )
    for scenario in config.generation.scenarios:
        scenario_dir = output_dir / scenario.name
        if not (scenario_dir / f"{scenario.name}_mutations.csv").exists():
            continue
        muts.append(pd.read_csv(scenario_dir / f"{scenario.name}_mutations.csv"))
        exprs.append(pd.read_csv(scenario_dir / f"{scenario.name}_expression.csv"))
        paths.append(pd.read_csv(scenario_dir / f"{scenario.name}_pathways.csv"))
        n = len(muts[-1])
        surv = float(scenario.conditions.get("survival_time", 800))
        event = int(scenario.conditions.get("event_occurred", 0))
        scenario_survival[scenario.name] = (
            np.full(n, surv), np.full(n, event)
        )
    if not muts:
        raise FileNotFoundError("No synthetic scenario data; run generate first")
    synth_mut = pd.concat(muts, ignore_index=True)
    synth_expr = pd.concat(exprs, ignore_index=True)
    synth_path = pd.concat(paths, ignore_index=True)

    report = AnalysisReport(config)
    report.mutation_frequency_scatter(real_mut, synth_mut)
    report.driver_gene_bars(real_mut, synth_mut)
    report.pathway_histograms(real_path, synth_path)
    common_expr = real_expr.columns.intersection(synth_expr.columns)
    report.embedding_plot(
        real_expr[common_expr].values, synth_expr[common_expr].values
    )
    report.km_curves(scenario_survival)

    validation_path = results_dir / "validation_results.csv"
    results: Dict[str, float] = {}
    if validation_path.exists():
        results = pd.read_csv(validation_path).iloc[0].to_dict()
        report.validation_bars(results)
        write_summary_report(results, results_dir / "summary_report.txt")
    logger.info("Analysis artifacts in %s", config.output.figures_dir)
    return results


def doctor(config: Config) -> Dict[str, str]:
    """Dimension-consistency checks (reference debug_model.py parity)."""
    _banner("DOCTOR: config / data / checkpoint consistency")
    report: Dict[str, str] = {}
    processed_dir = Path(config.data.processed_dir)

    dims_from_data: Optional[Dict[str, int]] = None
    try:
        mut = pd.read_csv(processed_dir / "mutation_matrix_aligned.csv",
                          index_col=0, nrows=1)
        expr = pd.read_csv(processed_dir / "expression_matrix_aligned.csv",
                           index_col=0, nrows=1)
        path = pd.read_csv(processed_dir / "pathway_scores.csv",
                           index_col=0, nrows=1)
        clin = pd.read_csv(processed_dir / "clinical_aligned.csv", nrows=1)
        dims_from_data = {
            "mutation": mut.shape[1],
            "expression": expr.shape[1],
            "pathway": path.shape[1],
        }
        report["data"] = f"OK {dims_from_data}"
        cond_cols = config.resolve_condition_columns(
            list(clin.columns) + ["survival_days_norm"]
        )
        report["conditions"] = (
            f"OK {cond_cols}" if len(cond_cols) == len(config.model.condition_on)
            else f"MISMATCH config={config.model.condition_on} data={cond_cols}"
        )
    except FileNotFoundError as e:
        report["data"] = f"MISSING {e}"

    meta = load_metadata(Path(config.training.save_dir))
    if meta is None:
        report["checkpoint"] = "MISSING (no metadata.json)"
    else:
        ck = meta["dims"]
        report["checkpoint"] = (
            f"OK mut={ck['mutation_dim']} expr={ck['expression_dim']} "
            f"path={ck['pathway_dim']} cond={len(ck['condition_names'])}"
        )
        if dims_from_data is not None:
            consistent = (
                ck["mutation_dim"] == dims_from_data["mutation"]
                and ck["expression_dim"] == dims_from_data["expression"]
                and ck["pathway_dim"] == dims_from_data["pathway"]
            )
            report["checkpoint_vs_data"] = "OK" if consistent else "MISMATCH"

    for scenario in config.generation.scenarios:
        unknown = [
            k for k in scenario.conditions
            if k not in config.model.condition_on
        ]
        if unknown:
            report[f"scenario:{scenario.name}"] = f"UNKNOWN CONDITIONS {unknown}"

    for key, value in report.items():
        logger.info("%-22s %s", key, value)
    return report


# ----------------------------------------------------------------------
STEP_FUNCTIONS = {
    "download": download_data,
    "preprocess": preprocess_data,
    "pathways": compute_pathway_features,
    "generate": generate_synthetic_patients,
    "validate": validate_synthetic_patients,
    "report": analysis_report,
    "doctor": doctor,
}

ALL_STEPS = ["download", "preprocess", "pathways", "train", "generate", "validate"]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Pediatric Osteosarcoma Disease Progression Model Pipeline "
        "(TPU-native)"
    )
    parser.add_argument("--config", type=str, default="config/config.yaml",
                        help="Path to configuration file")
    parser.add_argument(
        "--steps", nargs="+", default=["all"],
        choices=ALL_STEPS + ["all", "report", "doctor"],
        help="Pipeline steps to run",
    )
    parser.add_argument("--resume-training", action="store_true",
                        help="Resume training from the latest checkpoint")
    parser.add_argument("--profile", action="store_true",
                        help="Write a jax.profiler trace during training")
    args = parser.parse_args(argv)

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    config = Config.from_yaml(args.config)
    logger.info("Starting Osteosarcoma Disease Progression Pipeline (TPU)")
    logger.info("Configuration: %s", args.config)
    logger.info("Steps: %s", args.steps)

    steps = list(args.steps)
    if "all" in steps:
        steps = list(ALL_STEPS)

    try:
        for step in steps:
            if step == "train":
                train_model(config, resume=args.resume_training,
                            profile=args.profile)
            else:
                STEP_FUNCTIONS[step](config)
        _banner("PIPELINE COMPLETE!")
    except Exception as e:
        logger.error("Pipeline failed: %s", e, exc_info=True)
        raise


if __name__ == "__main__":
    main()
