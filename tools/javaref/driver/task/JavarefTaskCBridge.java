package task;

import java.io.File;
import java.util.HashMap;
import java.util.List;
import java.util.Map;

import model.feature.EventEventFeatureVector;
import model.feature.EventTimexFeatureVector;
import model.feature.PairFeatureVector;
import parser.TXPParser;
import parser.TimeMLParser;
import parser.entities.Doc;
import parser.entities.EntityEnum;
import parser.entities.Event;
import parser.entities.Timex;

/**
 * Same-package bridge replicating TempEval3TaskC.main's per-file merge
 * (TempEval3TaskC.java:439-556): T-T rule grid, E-T
 * rules-over-classifier building the anchor maps, E-E rules WITH anchor
 * reasoning (the 8-arg EventEventRelationRule ctor, R4) > CLINK
 * post-edit (R6) > classifier.  ALL event-timex pairs (including DCT)
 * go through the ET model — TaskC has no DCT split.  The Jython
 * closure is environmentally absent, so everything UP TO the closure is
 * pinned: prediction rows and the exact closure-input line sequence
 * (ttStr + etStr + eeStr with the reference's prepend-on-rule-hit
 * ordering and the tt SIMULTANEOUS->IDENTITY relabel at C:455-456).
 *
 * Output rows on stdout:
 *   <name> TAB tt|et|ee TAB src TAB tgt TAB gold TAB label
 *   <name> TAB graph TAB <idx> TAB src TAB tgt TAB label
 */
public class JavarefTaskCBridge {

    public interface FieldsResolver {
        TXPParser.Field[] fieldsFor(String path) throws Exception;
    }

    public static void run(String clinkPath, String[] txpPaths,
            FieldsResolver fields) throws Exception {
        TempEval3TaskC taskc = new TempEval3TaskC();
        model.classifier.EventTimexRelationClassifier etCls =
                new model.classifier.EventTimexRelationClassifier("te3", "liblinear");
        model.classifier.EventEventRelationClassifier eeCls =
                new model.classifier.EventEventRelationClassifier("te3", "liblinear");
        Map<String, Map<String, String>> clinkPerFile =
                clinkPath.equals("-")
                ? new HashMap<String, Map<String, String>>()
                : taskc.getCLINKs(clinkPath);
        // minimal TimeML stub: the helpers parse a tml sibling but the
        // parsed gold doc is unused on the test path
        File stubTml = File.createTempFile("javaref_stub", ".tml");
        stubTml.deleteOnExit();
        java.io.PrintWriter pw = new java.io.PrintWriter(stubTml);
        pw.println("<?xml version=\"1.0\"?><TimeML></TimeML>");
        pw.close();
        TimeMLParser tmlParser = new TimeMLParser(EntityEnum.Language.EN);
        for (String path : txpPaths) {
            String name = new File(path).getName();
            File txpFile = new File(path);
            Doc docTxp = new TXPParser(EntityEnum.Language.EN,
                    fields.fieldsFor(path)).parseDocument(path);
            String ttStr = "", etStr = "", eeStr = "";
            // T-T (C:452-465)
            Map<String, String> ttlinks = taskc.getTimexTimexRuleRelation(docTxp);
            for (String pair : ttlinks.keySet()) {
                String s = pair.split("\t")[0], t = pair.split("\t")[1];
                if (ttlinks.get(pair).equals("SIMULTANEOUS")) {
                    ttStr = "gold\t" + s + "\t" + t + "\tIDENTITY\n" + ttStr;
                } else {
                    ttStr += "gold\t" + s + "\t" + t + "\t" + ttlinks.get(pair) + "\n";
                }
                System.out.println(name + "\ttt\t" + s + "\t" + t
                        + "\t" + ttlinks.get(pair) + "\t" + ttlinks.get(pair));
            }
            // E-T (C:467-504)
            List<PairFeatureVector> etFvList = taskc.getEventTimexTlinksPerFile(
                    new TXPParser(EntityEnum.Language.EN, fields.fieldsFor(path)),
                    tmlParser, txpFile, stubTml, etCls, false);
            List<String> etClsTest = etCls.predict(etFvList,
                    "models/temprelpro-et.model");
            Map<String, String> etAnchor = new HashMap<>();
            Map<String, String> etBefore = new HashMap<>();
            Map<String, String> etAfter = new HashMap<>();
            for (int p = 0; p < etFvList.size(); p++) {
                EventTimexFeatureVector etfv =
                        new EventTimexFeatureVector(etFvList.get(p));
                model.rule.EventTimexRelationRule etRule =
                        new model.rule.EventTimexRelationRule(
                                (Event) etfv.getE1(), (Timex) etfv.getE2(),
                                docTxp, etfv.getMateDependencyPath());
                String rule = etRule.getRelType();
                String label = etClsTest.get(p);
                if (!rule.equals("O")) label = etRule.getRelType();
                if (label.equals("IS_INCLUDED"))
                    etAnchor.put(etfv.getE1().getID(), etfv.getE2().getID());
                else if (label.equals("BEFORE"))
                    etBefore.put(etfv.getE1().getID(), etfv.getE2().getID());
                else if (label.equals("AFTER"))
                    etAfter.put(etfv.getE1().getID(), etfv.getE2().getID());
                if (!rule.equals("O")) {
                    etStr = "gold\t" + etfv.getE1().getID() + "\t"
                            + etfv.getE2().getID() + "\t" + label + "\n" + etStr;
                } else {
                    etStr += "gold\t" + etfv.getE1().getID() + "\t"
                            + etfv.getE2().getID() + "\t" + label + "\n";
                }
                System.out.println(name + "\tet\t" + etfv.getE1().getID()
                        + "\t" + etfv.getE2().getID() + "\t" + etfv.getLabel()
                        + "\t" + label);
            }
            // E-E (C:511-556)
            List<PairFeatureVector> eeFvList = taskc.getEventEventTlinksPerFile(
                    new TXPParser(EntityEnum.Language.EN, fields.fieldsFor(path)),
                    tmlParser, txpFile, stubTml, eeCls, false);
            List<String> eeClsTest = eeCls.predict(eeFvList,
                    "models/temprelpro-ee.model");
            for (int p = 0; p < eeFvList.size(); p++) {
                EventEventFeatureVector eefv =
                        new EventEventFeatureVector(eeFvList.get(p));
                model.rule.EventEventRelationRule eeRule =
                        new model.rule.EventEventRelationRule(
                                (Event) eefv.getE1(), (Event) eefv.getE2(),
                                docTxp, eefv.getMateDependencyPath(),
                                etAnchor, etBefore, etAfter, ttlinks);
                String rule = eeRule.getRelType();
                String label = eeClsTest.get(p);
                if (!rule.equals("O")) {
                    label = eeRule.getRelType();
                } else if (clinkPerFile.containsKey(name)
                        && clinkPerFile.get(name).containsKey(
                                eefv.getE1().getID() + "," + eefv.getE2().getID())) {
                    String clinkLbl = clinkPerFile.get(name).get(
                            eefv.getE1().getID() + "," + eefv.getE2().getID());
                    if (clinkLbl.equals("CLINK")) label = "BEFORE";
                    else label = "AFTER";
                }
                if (!rule.equals("O")) {
                    eeStr = "gold\t" + eefv.getE1().getID() + "\t"
                            + eefv.getE2().getID() + "\t" + label + "\n" + eeStr;
                } else {
                    eeStr += "gold\t" + eefv.getE1().getID() + "\t"
                            + eefv.getE2().getID() + "\t" + label + "\n";
                }
                System.out.println(name + "\tee\t" + eefv.getE1().getID()
                        + "\t" + eefv.getE2().getID() + "\t" + eefv.getLabel()
                        + "\t" + label);
            }
            // closure input sequence (C:562 `ttStr + etStr + eeStr`)
            String[] lines = (ttStr + etStr + eeStr).split("\n");
            for (int li = 0; li < lines.length; li++) {
                if (lines[li].isEmpty()) continue;
                String[] c = lines[li].split("\t");
                System.out.println(name + "\tgraph\t" + li + "\t"
                        + c[1] + "\t" + c[2] + "\t" + c[3]);
            }
        }
    }
}
