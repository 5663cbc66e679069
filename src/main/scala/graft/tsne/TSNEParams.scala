package graft.tsne

/** Hyperparameters, defaults per the reference
  * (TSNEParam.scala:3-11, X2P.scala:14, SimpleTSNE.scala:17-21,
  * BHTSNE.scala:19-22). */
case class TSNEParams(
    perplexity: Double = 30.0,
    tol: Double = 1e-5,
    dims: Int = 2,
    maxIterations: Int = 1000,
    earlyExaggeration: Int = 100,     // iterations with exaggerated P
    exaggerationFactor: Double = 4.0,
    tMomentum: Int = 25,              // switch iteration for momentum
    initialMomentum: Double = 0.5,
    finalMomentum: Double = 0.8,
    eta: Double = 500.0,
    minGain: Double = 0.01,
    theta: Double = 0.5,              // Barnes-Hut accuracy knob
    reportLoss: Int = 10,             // loss cadence (BH)
    seed: Long = 42L,
    // opt-in approximate kNN for the affinity stage — the 100 TB path
    // (exact O(n²) candidates are the reference semantics and default).
    // bucket length defaults to the data-driven KNN.autoBucketLength.
    approxKnn: Boolean = false,
    approxKnnBucketLength: Option[Double] = None)
