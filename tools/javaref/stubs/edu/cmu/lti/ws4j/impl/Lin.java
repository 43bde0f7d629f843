package edu.cmu.lti.ws4j.impl;

import java.util.HashSet;
import java.util.List;
import java.util.Set;

import edu.cmu.lti.lexical_db.ILexicalDatabase;
import edu.cmu.lti.lexical_db.NictWordNet;
import edu.cmu.lti.ws4j.RelatednessCalculator;

/**
 * The REAL ws4j Lin algorithm over the vendored wnlin database (the
 * ws4j jar itself is absent from this sandbox):
 *
 *   calcRelatednessOfWords = max over POS pairs {noun-noun, verb-verb}
 *   of the max over all synset pairs of calcRelatedness(s1, s2);
 *   identical synsets -> 1.0 (Lin's max); otherwise
 *   2*IC(lcs)/(IC(s1)+IC(s2)) with the LCS chosen by highest IC among
 *   common subsumers (ICFinder.getLCSbyIC), 0 when either IC is 0;
 *   no concepts / no overlap -> 0.0 (Lin's min).
 *
 * Mirrors erex/wnlin.py statement for statement: ICs are parsed from
 * the same decimal literals and all arithmetic is IEEE-754 exact ops,
 * so scores are bit-identical to the Python engine's.
 */
public class Lin extends RelatednessCalculator {

    public Lin(ILexicalDatabase db) { super(db); }

    @Override
    public double calcRelatednessOfWords(String w1, String w2) {
        NictWordNet wn = (NictWordNet) db;
        double best = -1D;
        for (String pos : new String[]{"n", "v"}) {
            for (String s1 : wn.getAllConcepts(w1, pos)) {
                Set<String> anc1 = new HashSet<>(wn.ancestors(s1));
                double ic1 = wn.ic(s1);
                for (String s2 : wn.getAllConcepts(w2, pos)) {
                    double score;
                    if (s1.equals(s2)) {
                        score = 1.0;
                    } else {
                        double ic2 = wn.ic(s2);
                        if (ic1 > 0.0 && ic2 > 0.0) {
                            double lcsIC = -1D;
                            boolean found = false;
                            List<String> anc2 = wn.ancestors(s2);
                            for (String a : anc2) {
                                if (anc1.contains(a)) {
                                    double aic = wn.ic(a);
                                    if (!found || aic > lcsIC) lcsIC = aic;
                                    found = true;
                                }
                            }
                            score = found ? 2.0 * lcsIC / (ic1 + ic2) : 0.0;
                        } else {
                            score = 0.0;
                        }
                    }
                    if (score > best) best = score;
                }
            }
        }
        return best != -1D ? best : 0.0;
    }
}
