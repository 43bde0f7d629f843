package javaref;

import java.io.BufferedReader;
import java.io.InputStreamReader;

import de.bwaldvogel.liblinear.Feature;
import de.bwaldvogel.liblinear.FeatureNode;
import de.bwaldvogel.liblinear.Linear;
import de.bwaldvogel.liblinear.Model;
import de.bwaldvogel.liblinear.Parameter;
import de.bwaldvogel.liblinear.Problem;
import de.bwaldvogel.liblinear.SolverType;

/**
 * Ground-truth oracle for erex/liblinear.py::train_liblinear_dual:
 * trains EXACTLY like EventEventRelationClassifier.train
 * (/root/reference/src/model/classifier/EventEventRelationClassifier.java
 * :120-170): dense FeatureNode rows with indices 1..nFeatures (zero
 * values included), problem.n = nFeatures, problem.bias = 1.0 (no bias
 * node appended -- the reference's call-site quirk), solver
 * L2R_L2LOSS_SVC_DUAL, C = 1.0, eps = 0.01.
 *
 * stdin:  "l n" then l lines "label f1 ... fn".
 * stdout: "label id...", "nr_feature k", "w len", then the flat model
 * weight array (w[featureIdx * cols + classIdx]) one value per line as
 * Double.doubleToRawLongBits hex -- the bit-exact compare target.
 *
 * One training per JVM run: Linear's java.util.Random(0) is static and
 * never reset, so the stream position matters.
 */
public class TrainCheck {
    public static void main(String[] args) throws Exception {
        BufferedReader in =
            new BufferedReader(new InputStreamReader(System.in));
        String[] hdr = in.readLine().trim().split(" ");
        int l = Integer.parseInt(hdr[0]);
        int n = Integer.parseInt(hdr[1]);
        Feature[][] instances = new Feature[l][n];
        double[] labels = new double[l];
        for (int r = 0; r < l; r++) {
            String[] cols = in.readLine().trim().split(" ");
            labels[r] = Double.valueOf(cols[0]);
            for (int i = 0; i < n; i++)
                instances[r][i] =
                    new FeatureNode(i + 1, Double.valueOf(cols[i + 1]));
        }
        Problem problem = new Problem();
        problem.l = l;
        problem.n = n;
        problem.x = instances;
        problem.y = labels;
        problem.bias = 1.0;
        Parameter parameter =
            new Parameter(SolverType.L2R_L2LOSS_SVC_DUAL, 1.0, 0.01);
        Linear.disableDebugOutput();
        Model model = Linear.train(problem, parameter);
        StringBuilder sb = new StringBuilder();
        sb.append("label");
        for (int v : model.getLabels()) sb.append(' ').append(v);
        sb.append('\n');
        sb.append("nr_feature ").append(model.getNrFeature()).append('\n');
        double[] w = model.getFeatureWeights();
        sb.append("w ").append(w.length).append('\n');
        for (double v : w)
            sb.append(Long.toHexString(Double.doubleToRawLongBits(v)))
              .append('\n');
        System.out.print(sb);
    }
}
