package task;

import java.io.File;
import java.io.OutputStream;
import java.io.PrintStream;
import java.util.List;

import model.classifier.EventDctRelationClassifier;
import model.classifier.EventEventRelationClassifier;
import model.classifier.EventTimexRelationClassifier;
import model.feature.EventEventFeatureVector;
import model.feature.EventTimexFeatureVector;
import model.feature.PairFeatureVector;
import parser.TXPParser;
import parser.entities.EntityEnum;

/**
 * Same-package bridge replicating the TimeBank-Dense per-file classifier
 * flow as shipped (TimeBankDenseExperiments.java:965-990 flag block,
 * :995-1113 candidate building, :1286-1380 predictDense): candidates
 * from the TXP tlink cells (goldCandidate=false), NO rule sieve for
 * E-DCT / E-T / E-E (tlinkFrom*Rules all false), every candidate
 * classified by predictDense against the shipped tbdense-{dct,et,ee}
 * weights with the 6-entry labelDense decode.  E-DCT features come from
 * the 167-dim EventDctRelationClassifier featureList ("te3","logit" at
 * :1015); E-T / E-E reuse the standard 19/269-dim layouts.  MLN / REST /
 * coreference / causal post-edit / closure are all off in the shipped
 * config and are not exercised.
 *
 * Output rows on stdout:
 *   dense:     &lt;name&gt; TAB dct|et|ee TAB e1 TAB e2 TAB gold TAB label
 *   densefeat: &lt;name&gt; TAB dct TAB e1 TAB e2 TAB csvVector
 */
public class JavarefDenseBridge {

    public interface FieldsResolver {
        TXPParser.Field[] fieldsFor(String path) throws Exception;
    }

    static final PrintStream NULL_OUT = new PrintStream(new OutputStream() {
        public void write(int b) { }
    });

    public static void run(String mode, String[] txpPaths,
            FieldsResolver fields) throws Exception {
        TimeBankDenseExperiments dense = new TimeBankDenseExperiments();
        EventDctRelationClassifier dctCls =
                new EventDctRelationClassifier("tbdense", "logit");
        EventTimexRelationClassifier etCls =
                new EventTimexRelationClassifier("tbdense", "logit");
        EventEventRelationClassifier eeCls =
                new EventEventRelationClassifier("tbdense", "logit");
        PrintStream realOut = System.out;
        for (String path : txpPaths) {
            String name = new File(path).getName();
            File txpFile = new File(path);
            List<PairFeatureVector> dctFvList, etFvList, eeFvList;
            // the per-file helpers println every feature vector; keep
            // stdout clean for the golden rows
            System.setOut(NULL_OUT);
            try {
                dctFvList = dense.getEventDctTlinksPerFile(
                        new TXPParser(EntityEnum.Language.EN,
                                fields.fieldsFor(path)),
                        null, txpFile, null, dctCls, null, false, false);
                etFvList = dense.getEventTimexTlinksPerFile(
                        new TXPParser(EntityEnum.Language.EN,
                                fields.fieldsFor(path)),
                        null, txpFile, null, etCls, null, false, false);
                eeFvList = dense.getEventEventTlinksPerFile(
                        new TXPParser(EntityEnum.Language.EN,
                                fields.fieldsFor(path)),
                        null, txpFile, null, eeCls, null, false, false);
            } finally {
                System.setOut(realOut);
            }
            if (mode.equals("densefeat")) {
                for (PairFeatureVector fv : dctFvList) {
                    System.out.println(name + "\tdct"
                            + "\t" + fv.getE1().getID()
                            + "\t" + fv.getE2().getID()
                            + "\t" + fv.printCSVVectors());
                }
                continue;
            }
            List<String> dctPred = dctCls.predictDense(dctFvList,
                    "models/tbdense-dct.model");
            for (int i = 0; i < dctFvList.size(); i++) {
                EventTimexFeatureVector etfv =
                        new EventTimexFeatureVector(dctFvList.get(i));
                System.out.println(name + "\tdct"
                        + "\t" + etfv.getE1().getID()
                        + "\t" + etfv.getE2().getID()
                        + "\t" + etfv.getLabel()
                        + "\t" + dctPred.get(i));
            }
            List<String> etPred = etCls.predictDense(etFvList,
                    "models/tbdense-et.model");
            for (int i = 0; i < etFvList.size(); i++) {
                EventTimexFeatureVector etfv =
                        new EventTimexFeatureVector(etFvList.get(i));
                System.out.println(name + "\tet"
                        + "\t" + etfv.getE1().getID()
                        + "\t" + etfv.getE2().getID()
                        + "\t" + etfv.getLabel()
                        + "\t" + etPred.get(i));
            }
            List<String> eePred = eeCls.predictDense(eeFvList,
                    "models/tbdense-ee.model");
            for (int i = 0; i < eeFvList.size(); i++) {
                EventEventFeatureVector eefv =
                        new EventEventFeatureVector(eeFvList.get(i));
                System.out.println(name + "\tee"
                        + "\t" + eefv.getE1().getID()
                        + "\t" + eefv.getE2().getID()
                        + "\t" + eefv.getLabel()
                        + "\t" + eePred.get(i));
            }
        }
    }
}
